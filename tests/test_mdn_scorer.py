"""MDN scorer: shapes, SE(3) invariance, loss/grads."""
import jax
import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu.data.sample import Buckets
from diffbindfr_tpu.data.synthetic import synthetic_sample
from diffbindfr_tpu.models import mdn_scorer as mdn

CFG = mdn.MDNConfig(hidden=32, gvp_layers=2, gt_layers=2, pro_vector_hidden=4)
BUCKETS = Buckets(n_lig=12, n_lig_edges=28, n_tor=4, n_res=8, n_atm=48)


def _sample(seed=0):
    rng = np.random.default_rng(seed)
    s = synthetic_sample(rng, BUCKETS)
    # plausible atom14 positions: random around per-residue centers
    r = s.aatype.shape[0]
    pos14 = (rng.normal(size=(r, 14, 3)) * 0.8 + rng.normal(size=(r, 1, 3)) * 5.0)
    pos14 = (pos14 * s.atom14_mask[..., None]).astype(np.float32)
    lig_pos = s.lig_pos.copy()
    return jax.tree.map(jnp.asarray, s), jnp.asarray(lig_pos), jnp.asarray(pos14)


def test_score_finite_and_invariant():
    s, lig_pos, pos14 = _sample()
    params = mdn.init_params(jax.random.PRNGKey(0), CFG)
    score = mdn.score_sample(params, CFG, s, lig_pos, pos14)
    assert bool(jnp.isfinite(score))

    # global rotation + translation must not change the score
    rng = np.random.default_rng(4)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = jnp.asarray(
        np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ],
            dtype=np.float32,
        )
    )
    shift = jnp.asarray([1.0, -2.0, 0.5])
    score_r = mdn.score_sample(
        params, CFG, s,
        lig_pos @ R.T + shift,
        (pos14 @ R.T + shift) * s.atom14_mask[..., None],
    )
    np.testing.assert_allclose(float(score), float(score_r), rtol=2e-3)


def test_score_batch_and_loss():
    s, lig_pos, pos14 = _sample()
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), s)
    lp = jnp.stack([lig_pos, lig_pos])
    p14 = jnp.stack([pos14, pos14])
    params = mdn.init_params(jax.random.PRNGKey(0), CFG)
    scores = jax.jit(
        lambda p, b, l, a: mdn.score_batch(p, CFG, b, l, a)
    )(params, batch, lp, p14)
    assert scores.shape == (2,)
    np.testing.assert_allclose(np.asarray(scores[0]), np.asarray(scores[1]), rtol=1e-5)

    loss, grads = jax.value_and_grad(
        lambda p: mdn.mdn_loss(p, CFG, s, lig_pos, pos14)
    )(params)
    assert bool(jnp.isfinite(loss))
    gn = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads) if g is not None))
    )
    assert np.isfinite(gn) and gn > 0


def test_no_contact_pose_ranks_worst():
    """A pose with an EMPTY <5 A contact set must not win the nll ranking.

    Regression for the round-5 2zec LOO fold: a 22 A runaway pose got
    mean_nll = 0/1 = 0.0 and beat every in-pocket pose. Contact-free
    poses must score the NO_CONTACT_NLL sentinel (worst), and their
    summed probability must be 0 (worst under the `mdn` mode too)."""
    s, lig_pos, pos14 = _sample()
    params = mdn.init_params(jax.random.PRNGKey(0), CFG)
    sum_in, nll_in = mdn.score_sample_both(params, CFG, s, lig_pos, pos14)
    far = lig_pos + jnp.asarray([500.0, 0.0, 0.0])
    sum_out, nll_out = mdn.score_sample_both(params, CFG, s, far, pos14)
    assert float(sum_out) == 0.0
    assert float(nll_out) == mdn.NO_CONTACT_NLL
    assert float(nll_out) > float(nll_in)
    assert float(sum_in) > float(sum_out)


def test_atom14_slot_constants_match_tables():
    """The CA/N/C/O/CB slot constants must match constants/residues.py
    atom14 ordering (ADVICE r1: a swap silently fed O geometry as 'CB')."""
    from diffbindfr_tpu.constants import residues as rc

    names = rc.restype_name_to_atom14_names["ALA"]
    assert names[mdn.N_] == "N"
    assert names[mdn.CA] == "CA"
    assert names[mdn.C_] == "C"
    assert names[mdn.O_] == "O"
    assert names[mdn.CB] == "CB"
    # GLY has no CB -> its CB slot mask must be 0 so the CA fallback fires
    assert rc.restype_name_to_atom14_names["GLY"][mdn.CB] == ""
