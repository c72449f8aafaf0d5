import time, numpy as np, jax, jax.numpy as jnp
from diffbindfr_tpu.data.sample import Buckets
from diffbindfr_tpu.data.synthetic import synthetic_batch
from diffbindfr_tpu.models import score_net as sn

def timeit(f, *a, n=3):
    r = f(*a); s = float(jnp.sum(r.tr))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); r=f(*a); s=float(jnp.sum(r.tr)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

buckets = Buckets(n_lig=64, n_lig_edges=160, n_tor=16, n_res=64, n_atm=512)
rng = np.random.default_rng(0)
for B, dtype in ((8, 'float32'), (8, 'bfloat16'), (32, 'bfloat16')):
    batch = synthetic_batch(rng, B, buckets)
    t = jnp.full((B,), 0.5)
    sig = sn.Sigmas(*[jnp.full((B,), v) for v in (1.2, 0.5, 1.0, 1.0)])
    cfg = sn.ScoreNetConfig(compute_dtype=dtype)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)
    f = jax.jit(lambda p, b, t_, s_: sn.apply_batched(p, cfg, b, t_, s_))
    ms = timeit(f, params, batch, t, sig)
    print(f'B={B} {dtype}: {ms:.1f} ms -> {ms*20/B:.1f} ms per 20-step pose')
