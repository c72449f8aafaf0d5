import time, numpy as np, jax, jax.numpy as jnp
from diffbindfr_tpu.data.sample import Buckets
from diffbindfr_tpu.data.synthetic import synthetic_batch
from diffbindfr_tpu.models import score_net as sn
B, REPS = 16, 10
buckets = Buckets(n_lig=64, n_lig_edges=160, n_tor=16, n_res=64, n_atm=512)
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, B, buckets)
t = jnp.full((B,), 0.5)
sig = sn.Sigmas(*[jnp.full((B,), v) for v in (1.2, 0.5, 1.0, 1.0)])
def timeit(f, *a):
    s=float(f(*a)); ts=[]
    for _ in range(3):
        t0=time.perf_counter(); s=float(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3/REPS
def rep(cfg):
    def wrapped(params, batch, t, sig):
        def body(i, acc):
            out = sn.apply_batched(params, cfg, batch._replace(lig_pos=batch.lig_pos + acc*1e-20), t, sig)
            return acc + jnp.sum(out.tr)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return jax.jit(wrapped)
for name, kw in [("1 layer", dict(num_conv_layers=1)), ("no sc", dict(no_sc_torsion=True))]:
    cfg = sn.ScoreNetConfig(compute_dtype='bfloat16', use_pallas=True, **kw)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)
    print(f'{name}: {timeit(rep(cfg), params, batch, t, sig):7.1f} ms/apply', flush=True)
