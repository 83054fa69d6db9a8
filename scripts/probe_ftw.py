"""A/B probe: v2 raw engine with factored-resident pass-1 twiddle vs the
dense streamed twiddle, in-process, at the direct-G1 GLOBAL bench shapes."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, ".")
import portfft_tpu as pfft
from portfft_tpu.config import enable_persistent_cache
enable_persistent_cache()
from portfft_tpu.ops import pallas_global


def measure(fn, *args, iters=10):
    r = fn(*args)
    jax.device_get(r.ravel()[0:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.device_get(r.ravel()[0:1])
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts), r


def run(n, batch, t1, t2):
    print(f"\n== N={n} b={batch} t1={t1} t2={t2} ==", flush=True)
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit()
    p0 = plan.plans[n]
    print("plan:", p0.describe(), flush=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    xd = jnp.asarray(x)
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    keys = plan._bank_keys
    keys_nofac = {k: v for k, v in keys.items() if k[0] not in ("Q", "ZQ")}
    bank = plan._bank_arrays
    for name, kk in (("dense", keys_nofac), ("factored", keys)):
        def fn(raw, kk=kk):
            return pallas_global.global2_raw_call(
                raw, batch, p0, -1, kk, bank, plan.config, None, 1.0, t1, t2
            )
        try:
            t, r = measure(jax.jit(fn), xd)
        except Exception as e:
            print(f"  {name}: FAILED {str(e)[:150]}", flush=True)
            continue
        gbps = 2 * batch * n * 8 / t / 1e9
        gc = np.asarray(r).view(np.complex64).reshape(batch, n)
        err = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        print(f"  {name:9s}: {t*1e3:8.3f} ms  {gbps:7.1f} GB/s  rel={err:.2e}",
              flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    run(65536, 2048, 256, 256)
    run(1 << 17, 1024, 256, 256)
    run(1 << 18, 512, 128, 256)
    run(1 << 19, 256, 64, 256)
    run(1 << 20, 128, 64, 256)
