"""NMS-only on-chip timings: scan vs fixed-point vs Pallas at K=128/512/1024.

Timing per CLAUDE.md: device-resident inputs, pipelined dispatch,
single host fetch of a small reduction as the fence.
"""
import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from tf2_yolo_tpu.ops.nms import nms, nms_scan, _nms_via_pallas

N = 32
rng = np.random.RandomState(0)
for K in (128, 512, 1024):
    # clustered boxes so suppression actually happens
    centers = rng.rand(N, K // 8, 2)
    idx = rng.randint(0, K // 8, (N, K))
    xy = centers[np.arange(N)[:, None], idx] + 0.02 * rng.randn(N, K, 2)
    wh = 0.05 + 0.05 * rng.rand(N, K, 2)
    conf = rng.rand(N, K, 1)
    cls = rng.rand(N, K, 1)
    rows = jnp.asarray(np.concatenate(
        [xy, wh, conf, cls, np.zeros((N, K, 1))], -1).astype(np.float32))
    valid = jnp.asarray(conf[..., 0] > 0.3)

    fns = {"fixedpoint": jax.jit(lambda r, v: nms(r, v)),
           "scan": jax.jit(lambda r, v: nms_scan(r, v))}
    platform = jax.devices()[0].platform
    if platform == "tpu":
        fns["pallas"] = jax.jit(
            lambda r, v: _nms_via_pallas(r, v, 0.45, 1))
    out = {}
    for name, fn in fns.items():
        keep = fn(rows, valid)
        if isinstance(keep, tuple):
            keep = keep[-1]
        int(jnp.sum(keep))                      # warm + fence
        t0 = time.perf_counter()
        last = None
        for _ in range(30):
            last = fn(rows, valid)
        k = last[-1] if isinstance(last, tuple) else last
        int(jnp.sum(k))                          # single fence
        out[name] = (time.perf_counter() - t0) / 30 * 1e3
    # agreement check fixedpoint vs scan
    a = fns["fixedpoint"](rows, valid); b = fns["scan"](rows, valid)
    ka = a[-1] if isinstance(a, tuple) else a
    kb = b[-1] if isinstance(b, tuple) else b
    same = bool(jnp.all(ka == kb))
    print(f"K={K}: " + "  ".join(f"{n}={v:.2f}ms" for n, v in out.items())
          + f"  agree={same}")
