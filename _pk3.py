import time, numpy as np, jax, jax.numpy as jnp
from diffbindfr_tpu.data.sample import Buckets
from diffbindfr_tpu.data.synthetic import synthetic_batch
from diffbindfr_tpu.models import score_net as sn
B = 16
buckets = Buckets(n_lig=64, n_lig_edges=160, n_tor=16, n_res=64, n_atm=512)
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, B, buckets)
t = jnp.full((B,), 0.5)
sig = sn.Sigmas(*[jnp.full((B,), v) for v in (1.2, 0.5, 1.0, 1.0)])
cfg = sn.ScoreNetConfig(compute_dtype='bfloat16', use_pallas=True)
params = sn.init_params(jax.random.PRNGKey(0), cfg)
f = jax.jit(lambda p,b,t_,s_: sn.apply_batched(p, cfg, b, t_, s_))
t0=time.time()
jax.block_until_ready(f(params, batch, t, sig))
print('compile+first run:', round(time.time()-t0,1), 's')
ts=[]
for _ in range(5):
    t0=time.perf_counter(); s_=float(jnp.sum(f(params,batch,t,sig).tr)); ts.append(time.perf_counter()-t0)
print(f'pallas dual-cross: {min(ts)*1e3:.1f} ms/apply (B={B})')
