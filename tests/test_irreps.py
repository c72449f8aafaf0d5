import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from diffbindfr_tpu.nn import irreps as ir


def _rand_R(seed=0):
    return Rotation.random(random_state=seed).as_matrix()


def test_irreps_parse():
    x = ir.Irreps.parse("48x0e+12x1o+12x1e+48x0o")
    assert x.dim == 48 + 36 + 36 + 48
    assert x.num_scalars == 48
    assert str(x) == "48x0e+12x1o+12x1e+48x0o"


def test_sh_component_normalization(rng):
    v = rng.normal(size=(100, 3))
    Y = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v)))
    # per-l squared norms are 2l+1 on the unit sphere
    assert np.allclose((Y[:, :1] ** 2).sum(-1), 1.0, atol=1e-4)
    assert np.allclose((Y[:, 1:4] ** 2).sum(-1), 3.0, atol=1e-3)
    assert np.allclose((Y[:, 4:9] ** 2).sum(-1), 5.0, atol=1e-3)


def test_sh_equivariance(rng):
    R = _rand_R(1)
    v = rng.normal(size=(50, 3))
    Y1 = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v @ R.T)))
    Y0 = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v)))
    Y0_rot = ir.rotate_features(ir.SH_IRREPS_L2, Y0, R)
    assert np.allclose(Y1, Y0_rot, atol=1e-4)


def test_wigner_is_representation():
    Ra, Rb = _rand_R(2), _rand_R(3)
    for l in (1, 2):
        Da = ir.wigner_d_real(l, Ra)
        Db = ir.wigner_d_real(l, Rb)
        Dab = ir.wigner_d_real(l, Ra @ Rb)
        assert np.allclose(Da @ Db, Dab, atol=1e-8)
        assert np.allclose(Da @ Da.T, np.eye(2 * l + 1), atol=1e-8)


def test_cg_known_cases():
    # 1 x 1 -> 0 is the normalized dot product
    C = ir.clebsch_gordan(1, 1, 0)
    assert np.allclose(C[:, :, 0], np.eye(3) / np.sqrt(3), atol=1e-8)
    # 1 x 1 -> 1 is the normalized cross product (antisymmetric)
    C = ir.clebsch_gordan(1, 1, 1)
    assert np.allclose(C, -np.transpose(C, (1, 0, 2)), atol=1e-8)
    assert np.allclose(np.linalg.norm(C), 1.0)


def test_fc_tensor_product_equivariance(rng):
    in1 = "4x0e+2x1o+2x1e+4x0o"
    sh = "1x0e+1x1o+1x2e"
    out = "4x0e+2x1o+2x1e+4x0o"
    spec = ir.compile_fc_tensor_product(in1, sh, out)
    assert spec.weight_numel > 0
    E = 7
    x = rng.normal(size=(E, spec.in1.dim)).astype(np.float32)
    v = rng.normal(size=(E, 3)).astype(np.float32)
    y = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v)))
    w = rng.normal(size=(E, spec.weight_numel)).astype(np.float32)

    out0 = np.asarray(
        ir.apply_fc_tensor_product(spec, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    )
    R = _rand_R(4)
    x_rot = ir.rotate_features(spec.in1, x, R).astype(np.float32)
    y_rot = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v @ R.T)))
    out1 = np.asarray(
        ir.apply_fc_tensor_product(
            spec, jnp.asarray(x_rot), jnp.asarray(y_rot), jnp.asarray(w)
        )
    )
    out0_rot = ir.rotate_features(spec.out, out0, R)
    assert np.allclose(out1, out0_rot, atol=1e-3)


def test_full_tensor_product_equivariance(rng):
    spec = ir.compile_full_tensor_product("1x0e+1x1o+1x2e", "1x2e", lmax_out=1)
    E = 5
    v1 = rng.normal(size=(E, 3)).astype(np.float32)
    v2 = rng.normal(size=(E, 3)).astype(np.float32)
    y1 = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v1)))
    y2 = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v2)))[:, 4:9]
    out0 = np.asarray(
        ir.apply_full_tensor_product(spec, jnp.asarray(y1), jnp.asarray(y2))
    )
    R = _rand_R(5)
    y1r = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v1 @ R.T)))
    y2r = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v2 @ R.T)))[:, 4:9]
    out1 = np.asarray(
        ir.apply_full_tensor_product(spec, jnp.asarray(y1r), jnp.asarray(y2r))
    )
    out0_rot = ir.rotate_features(spec.out, out0, R)
    assert np.allclose(out1, out0_rot, atol=1e-3)


def test_fc_tp_variance_is_order_one(rng):
    spec = ir.compile_fc_tensor_product(
        "48x0e+12x1o+12x1e+48x0o", "1x0e+1x1o+1x2e", "48x0e+12x1o+12x1e+48x0o"
    )
    E = 256
    x = rng.normal(size=(E, spec.in1.dim)).astype(np.float32)
    v = rng.normal(size=(E, 3)).astype(np.float32)
    y = np.asarray(ir.spherical_harmonics_l2(jnp.asarray(v)))
    w = rng.normal(size=(E, spec.weight_numel)).astype(np.float32)
    out = np.asarray(
        ir.apply_fc_tensor_product(spec, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    )
    std = out.std()
    assert 0.3 < std < 3.5, std
