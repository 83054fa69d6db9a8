#!/usr/bin/env python
"""Merge the user tuning cache (written by scripts/tune.py / autotune runs
on the attached device) into the shipped tuning_defaults.json."""

import json
import sys

sys.path.insert(0, ".")

from portfft_tpu import tuning  # noqa: E402

def main():
    with open(tuning._DEFAULTS_PATH) as f:
        defaults = json.load(f)
    try:
        with open(tuning._USER_PATH) as f:
            user = json.load(f)
    except OSError:
        print("no user cache at", tuning._USER_PATH)
        return
    n = 0
    for dev, kinds in user.items():
        for kind, entries in kinds.items():
            for key, params in entries.items():
                defaults.setdefault(dev, {}).setdefault(kind, {})[key] = params
                n += 1
    with open(tuning._DEFAULTS_PATH, "w") as f:
        json.dump(defaults, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"merged {n} entries into {tuning._DEFAULTS_PATH}")

if __name__ == "__main__":
    main()
