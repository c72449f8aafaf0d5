"""KarmaDock pose-refinement model: shapes, equivariance of coordinates."""
import jax
import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu.models import karmadock as kd
from diffbindfr_tpu.models import mdn_scorer as mdn

from test_mdn_scorer import _sample

CFG = kd.KarmaDockConfig(
    mdn=mdn.MDNConfig(hidden=32, gvp_layers=1, gt_layers=1, pro_vector_hidden=4),
    egnn_layers=2,
)


def test_karmadock_forward():
    s, lig_pos, pos14 = _sample()
    params = kd.init_params(jax.random.PRNGKey(0), CFG)
    out = kd.apply(params, CFG, s, lig_pos, pos14)
    assert out.lig_pos.shape == lig_pos.shape
    assert out.chi_sincos.shape == (s.aatype.shape[0], 4, 2)
    for leaf in (out.lig_pos, out.mdn_score, out.chi_sincos):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # sincos normalized
    n = jnp.linalg.norm(out.chi_sincos, axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=5e-4)
    # padded ligand atoms do not move
    pad = np.asarray(s.lig_mask) == 0
    np.testing.assert_array_equal(
        np.asarray(out.lig_pos)[pad], np.asarray(lig_pos)[pad]
    )


def test_karmadock_pose_equivariance():
    """Refined coordinates rotate with the input frame; score invariant."""
    s, lig_pos, pos14 = _sample()
    params = kd.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = jnp.asarray(np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32))
    out0 = kd.apply(params, CFG, s, lig_pos, pos14)
    outR = kd.apply(
        params, CFG, s,
        (lig_pos @ R.T) * s.lig_mask[:, None],
        (pos14 @ R.T) * s.atom14_mask[..., None],
    )
    mask = np.asarray(s.lig_mask) > 0
    np.testing.assert_allclose(
        np.asarray(outR.lig_pos)[mask],
        np.asarray(out0.lig_pos @ R.T)[mask],
        atol=3e-3,
    )
    np.testing.assert_allclose(
        float(outR.mdn_score), float(out0.mdn_score), rtol=2e-3
    )
