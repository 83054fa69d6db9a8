#!/usr/bin/env python
"""Merge measured autotune winners into the shipped tuning defaults.

``scripts/tune.py`` / ``CommittedDescriptor.autotune`` persist winners to
the user cache (~/.cache/portfft_tpu_tuning.json or $PORTFFT_TUNING_CACHE).
This script deep-merges that cache into ``portfft_tpu/tuning_defaults.json``
(device -> kernel-kind -> shape-key -> params), cache winning on conflicts,
and prints a diff of what changed.  Run after a tune sweep, review the
diff, commit the JSON.

Usage: python scripts/merge_tuning.py [--dry-run]
"""

import json
import os
import sys

CACHE = os.path.expanduser(
    os.environ.get("PORTFFT_TUNING_CACHE", "~/.cache/portfft_tpu_tuning.json")
)
DEFAULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "portfft_tpu", "tuning_defaults.json",
)


def main() -> int:
    if not os.path.exists(CACHE):
        print(f"no tuning cache at {CACHE}; nothing to merge")
        return 1
    with open(CACHE) as f:
        cache = json.load(f)
    with open(DEFAULTS) as f:
        defaults = json.load(f)

    changed = []
    for device, kinds in cache.items():
        dd = defaults.setdefault(device, {})
        for kind, keys in kinds.items():
            kd = dd.setdefault(kind, {})
            for key, params in keys.items():
                old = kd.get(key)
                if old != params:
                    changed.append((device, kind, key, old, params))
                    kd[key] = params
    if not changed:
        print("defaults already match the cache")
        return 0
    for device, kind, key, old, params in changed:
        print(f"{device}/{kind}/{key}: {old} -> {params}")
    if "--dry-run" in sys.argv:
        print(f"(dry run: {len(changed)} entries not written)")
        return 0
    with open(DEFAULTS, "w") as f:
        json.dump(defaults, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(changed)} updated entries to {DEFAULTS}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
