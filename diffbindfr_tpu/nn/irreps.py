"""Minimal O(3)-irreps algebra: real spherical harmonics, Wigner matrices,
Clebsch-Gordan tensors, and weighted tensor-product path compilation.

This replaces the reference's dependency on e3nn
(druglib/models/Docking/interaction/tpscore.py:7, o3.FullyConnectedTensorProduct
/ o3.spherical_harmonics) with a self-contained implementation sized for the
small fixed irreps ladder used by the score network (l <= 2). Conventions:

  * l=1 basis is (x, y, z); l=2 basis is the standard real quadratic forms
    (xy, yz, 3z^2-1, xz, x^2-y^2) — self-consistent, *not* e3nn's (y, z, x)
    ordering. All equivariance tests derive Wigner matrices from these same
    definitions, so the convention is closed.
  * 'component' normalization: |Y_l(v)|^2 = 2l+1 for unit v.
  * Clebsch-Gordan tensors are computed numerically once per (l1, l2, l3) by
    projecting onto the rotation-invariant subspace of D1 x D2 x D3 (unique
    by Schur when the triangle inequality holds), Frobenius-normalized, with
    a deterministic sign. Parity is a separate Z2 label handled at path
    enumeration (p3 = p1 * p2).
"""
from __future__ import annotations

import dataclasses
import functools
import re

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Irreps
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Irrep:
    l: int
    p: int  # +1 even, -1 odd

    @property
    def dim(self) -> int:
        return 2 * self.l + 1

    def __str__(self):
        return f"{self.l}{'e' if self.p == 1 else 'o'}"


@dataclasses.dataclass(frozen=True)
class Irreps:
    items: tuple  # tuple[(mul, Irrep), ...]

    @staticmethod
    def parse(s: str | "Irreps") -> "Irreps":
        if isinstance(s, Irreps):
            return s
        items = []
        for term in s.replace(" ", "").split("+"):
            m = re.fullmatch(r"(?:(\d+)x)?(\d+)([eo])", term)
            if not m:
                raise ValueError(f"bad irreps term {term!r}")
            mul = int(m.group(1) or 1)
            items.append((mul, Irrep(int(m.group(2)), 1 if m.group(3) == "e" else -1)))
        return Irreps(tuple(items))

    @property
    def dim(self) -> int:
        return sum(mul * ir.dim for mul, ir in self.items)

    @property
    def num_scalars(self) -> int:
        return sum(mul for mul, ir in self.items if ir.l == 0 and ir.p == 1)

    def slices(self):
        out, off = [], 0
        for mul, ir in self.items:
            out.append((off, mul, ir))
            off += mul * ir.dim
        return out

    def __str__(self):
        return "+".join(f"{mul}x{ir}" for mul, ir in self.items)


SH_IRREPS_L2 = Irreps.parse("1x0e+1x1o+1x2e")

# ---------------------------------------------------------------------------
# Real spherical harmonics (component normalization), l <= 2
# ---------------------------------------------------------------------------

_SQRT3 = float(np.sqrt(3.0))
_SQRT15 = float(np.sqrt(15.0))
_SQRT5 = float(np.sqrt(5.0))


def spherical_harmonics_l2(vec: jnp.ndarray, normalize: bool = True, eps: float = 1e-9):
    """Y_{0..2}(vec) -> [..., 9]; zero vectors map to (1, 0, ..., 0)."""
    if normalize:
        n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
        v = vec / jnp.maximum(n, eps)
    else:
        v = vec
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    y0 = jnp.ones_like(x)
    y1 = jnp.stack([x, y, z], axis=-1) * _SQRT3
    y2 = jnp.stack(
        [
            _SQRT15 * x * y,
            _SQRT15 * y * z,
            _SQRT5 / 2.0 * (3.0 * z * z - 1.0),
            _SQRT15 * x * z,
            _SQRT15 / 2.0 * (x * x - y * y),
        ],
        axis=-1,
    )
    return jnp.concatenate([y0[..., None], y1, y2], axis=-1)


def _sh_np(l: int, v: np.ndarray) -> np.ndarray:
    """numpy single-l spherical harmonics on unit vectors (for solvers)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    if l == 0:
        return np.ones(v.shape[:-1] + (1,))
    if l == 1:
        return np.stack([x, y, z], axis=-1) * _SQRT3
    if l == 2:
        return np.stack(
            [
                _SQRT15 * x * y,
                _SQRT15 * y * z,
                _SQRT5 / 2.0 * (3 * z * z - 1),
                _SQRT15 * x * z,
                _SQRT15 / 2.0 * (x * x - y * y),
            ],
            axis=-1,
        )
    raise NotImplementedError(l)


@functools.lru_cache(maxsize=None)
def _wigner_sample_points(n: int = 64) -> np.ndarray:
    rng = np.random.default_rng(12345)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def wigner_d_real(l: int, R: np.ndarray) -> np.ndarray:
    """Real Wigner matrix D_l(R) in this module's SH basis, via least squares
    on Y_l(R v) = D_l(R) Y_l(v)."""
    if l == 0:
        return np.ones((1, 1))
    if l == 1:
        return R.copy()
    v = _wigner_sample_points()
    A = _sh_np(l, v)  # [K, 2l+1]
    B = _sh_np(l, v @ R.T)  # [K, 2l+1]
    D, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D.T


@functools.lru_cache(maxsize=None)
def clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """Invariant coupling tensor C [2l1+1, 2l2+1, 2l3+1], ||C||_F = 1.

    Solves for the one-dimensional invariant subspace of D1 x D2 x D3 over
    several random rotations (Schur uniqueness under |l1-l2|<=l3<=l1+l2).
    """
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        raise ValueError(f"triangle violated: {l1} {l2} {l3}")
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    dim = d1 * d2 * d3
    rng = np.random.default_rng(2024)
    M = np.zeros((dim, dim))
    for _ in range(6):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        D = np.kron(
            np.kron(wigner_d_real(l1, R), wigner_d_real(l2, R)), wigner_d_real(l3, R)
        )
        A = D - np.eye(dim)
        M += A.T @ A
    w_eig, v_eig = np.linalg.eigh(M)
    assert w_eig[0] < 1e-8, f"no invariant found for ({l1},{l2},{l3}): {w_eig[0]}"
    if dim > 1:
        assert w_eig[1] > 1e-4, f"invariant not unique for ({l1},{l2},{l3})"
    C = v_eig[:, 0].reshape(d1, d2, d3)
    # deterministic sign: make the largest-|.| entry positive
    flat = C.ravel()
    C = C * np.sign(flat[np.argmax(np.abs(flat))])
    return C.astype(np.float64)


# ---------------------------------------------------------------------------
# Tensor-product path compilation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TPPath:
    i1: int  # index into in1 irreps
    i2: int  # index into in2 irreps
    i3: int  # index into out irreps
    s1: int  # flat offsets
    s2: int
    s3: int
    mul1: int
    mul2: int
    mul3: int
    l1: int
    l2: int
    l3: int
    w_offset: int  # offset into flat weight vector
    alpha: float  # normalization


@dataclasses.dataclass(frozen=True)
class TensorProductSpec:
    in1: Irreps
    in2: Irreps
    out: Irreps
    paths: tuple
    weight_numel: int


@functools.lru_cache(maxsize=None)
def compile_fc_tensor_product(in1_s: str, in2_s: str, out_s: str) -> TensorProductSpec:
    """Enumerate all symmetry-allowed fully-connected paths with weights
    (mul1 x mul2 x mul3 per path) and fan-in normalization."""
    in1, in2, out = Irreps.parse(in1_s), Irreps.parse(in2_s), Irreps.parse(out_s)
    raw = []
    for i1, (off1, mul1, ir1) in enumerate(in1.slices()):
        for i2, (off2, mul2, ir2) in enumerate(in2.slices()):
            for i3, (off3, mul3, ir3) in enumerate(out.slices()):
                if ir3.p != ir1.p * ir2.p:
                    continue
                if not (abs(ir1.l - ir2.l) <= ir3.l <= ir1.l + ir2.l):
                    continue
                raw.append(
                    (i1, i2, i3, off1, off2, off3, mul1, mul2, mul3, ir1.l, ir2.l, ir3.l)
                )
    # fan-in per output irrep for normalization
    fan_in = {}
    for r in raw:
        fan_in[r[2]] = fan_in.get(r[2], 0) + r[6] * r[7]
    paths = []
    w_off = 0
    for r in raw:
        i1, i2, i3, s1, s2, s3, mul1, mul2, mul3, l1, l2, l3 = r
        alpha = float(np.sqrt((2 * l3 + 1) / max(fan_in[i3], 1)))
        paths.append(
            TPPath(i1, i2, i3, s1, s2, s3, mul1, mul2, mul3, l1, l2, l3, w_off, alpha)
        )
        w_off += mul1 * mul2 * mul3
    return TensorProductSpec(in1, in2, out, tuple(paths), w_off)


def apply_fc_tensor_product(
    spec: TensorProductSpec,
    x1: jnp.ndarray,  # [E, in1.dim]
    x2: jnp.ndarray,  # [E, in2.dim]
    weights: jnp.ndarray,  # [E, weight_numel]
) -> jnp.ndarray:
    """Weighted fully-connected tensor product, batched over edges.

    XLA-tuned formulation: per output slot we sum path contributions and
    concatenate once (no read-modify-write of the full output per path),
    and the Clebsch-Gordan contraction is specialized for the mul2 == 1 /
    small-d structure of spherical-harmonic second inputs.
    """
    lead = x1.shape[:-1]
    slot_acc: dict = {}
    for p in spec.paths:
        d1, d2, d3 = 2 * p.l1 + 1, 2 * p.l2 + 1, 2 * p.l3 + 1
        a = x1[..., p.s1 : p.s1 + p.mul1 * d1].reshape(lead + (p.mul1, d1))
        b = x2[..., p.s2 : p.s2 + p.mul2 * d2].reshape(lead + (p.mul2, d2))
        w = weights[..., p.w_offset : p.w_offset + p.mul1 * p.mul2 * p.mul3]
        C = jnp.asarray(clebsch_gordan(p.l1, p.l2, p.l3), dtype=x1.dtype)
        if p.mul2 == 1:
            bb = b[..., 0, :]  # [E, d2]
            # Cb[e, i, k] = sum_j b[e, j] C[i, j, k] — one [E,d2]@[d2,d1*d3]
            Cb = (bb @ C.transpose(1, 0, 2).reshape(d2, d1 * d3)).reshape(
                lead + (d1, d3)
            )
            if d1 == 1:
                z = a[..., :, 0][..., :, None] * Cb[..., 0, :][..., None, :]
            else:
                z = jnp.einsum("...ui,...ik->...uk", a, Cb)
            w = w.reshape(lead + (p.mul1, p.mul3))
            y = jnp.einsum("...uw,...uk->...wk", w, z) * p.alpha
        else:
            w4 = w.reshape(lead + (p.mul1, p.mul2, p.mul3))
            z = jnp.einsum("...ui,...vj,ijk->...uvk", a, b, C)
            y = jnp.einsum("...uvw,...uvk->...wk", w4, z) * p.alpha
        y = y.reshape(lead + (p.mul3 * d3,))
        if p.i3 in slot_acc:
            slot_acc[p.i3] = slot_acc[p.i3] + y
        else:
            slot_acc[p.i3] = y
    parts = []
    for i3, (off, mul, ir) in enumerate(spec.out.slices()):
        if i3 in slot_acc:
            parts.append(slot_acc[i3])
        else:
            parts.append(jnp.zeros(lead + (mul * ir.dim,), x1.dtype))
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def compile_dw_tensor_product(
    in1_s: str, in2_s: str, lmax_out: int = 2
) -> TensorProductSpec:
    """Depthwise ('uvu') tensor product: one weight per (path, channel),
    mul3 = mul1, each coupling emitting its own output slot (truncated at
    lmax_out). The TPU-fast factorization of the fully-connected TP:
    per-edge weights only gate channels (VPU elementwise); cross-channel
    mixing is a separate edge-independent irreps Linear that lowers to big
    MXU matmuls (the NequIP/MACE separable-TP design)."""
    in1, in2 = Irreps.parse(in1_s), Irreps.parse(in2_s)
    out_items = []
    paths = []
    w_off = 0
    for i1, (off1, mul1, ir1) in enumerate(in1.slices()):
        for i2, (off2, mul2, ir2) in enumerate(in2.slices()):
            assert mul2 == 1, "depthwise TP expects mul-1 second input (sh)"
            for l3 in range(abs(ir1.l - ir2.l), ir1.l + ir2.l + 1):
                if l3 > lmax_out:
                    continue
                p3 = ir1.p * ir2.p
                i3 = len(out_items)
                out_items.append((mul1, Irrep(l3, p3)))
                alpha = float(np.sqrt(2 * l3 + 1))
                s3 = sum(m * ir.dim for m, ir in out_items[:-1])
                paths.append(
                    TPPath(
                        i1, i2, i3, off1, off2, s3, mul1, 1, mul1,
                        ir1.l, ir2.l, l3, w_off, alpha,
                    )
                )
                w_off += mul1
    out = Irreps(tuple(out_items))
    return TensorProductSpec(in1, in2, out, tuple(paths), w_off)


def apply_dw_tensor_product(
    spec: TensorProductSpec,
    x1: jnp.ndarray,  # [E, in1.dim]
    x2: jnp.ndarray,  # [E, in2.dim] (mul-1 irreps, e.g. spherical harmonics)
    weights: jnp.ndarray,  # [E, weight_numel]
) -> jnp.ndarray:
    """Depthwise weighted TP: y_p[e, u, k] = w_p[e, u] sum_ij a[e,u,i]
    b[e,j] C[ijk]. All ops are elementwise/broadcast over channels (VPU)."""
    lead = x1.shape[:-1]
    slot_acc: dict = {}
    for p in spec.paths:
        d1, d2, d3 = 2 * p.l1 + 1, 2 * p.l2 + 1, 2 * p.l3 + 1
        a = x1[..., p.s1 : p.s1 + p.mul1 * d1].reshape(lead + (p.mul1, d1))
        b = x2[..., p.s2 : p.s2 + d2]
        w = weights[..., p.w_offset : p.w_offset + p.mul1]
        C = jnp.asarray(clebsch_gordan(p.l1, p.l2, p.l3), dtype=x1.dtype)
        Cb = (b @ C.transpose(1, 0, 2).reshape(d2, d1 * d3)).reshape(lead + (d1, d3))
        if d1 == 1:
            z = a[..., :, 0][..., :, None] * Cb[..., 0, :][..., None, :]
        elif d3 == 1:
            z = jnp.einsum("...ui,...i->...u", a, Cb[..., 0])[..., None]
        else:
            z = jnp.einsum("...ui,...ik->...uk", a, Cb)
        y = (z * w[..., None] * p.alpha).reshape(lead + (p.mul1 * d3,))
        slot_acc[p.i3] = slot_acc.get(p.i3, 0) + y
    parts = []
    for i3, (off, mul, ir) in enumerate(spec.out.slices()):
        if i3 in slot_acc:
            parts.append(slot_acc[i3])
        else:
            parts.append(jnp.zeros(lead + (mul * ir.dim,), x1.dtype))
    return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    in_irreps: Irreps
    out_irreps: Irreps
    blocks: tuple  # ((in_slots tuple, out_slot, w_offset, n_in, mul_out), ...)
    weight_numel: int


@functools.lru_cache(maxsize=None)
def compile_linear(in_s: str, out_s: str) -> LinearSpec:
    """Equivariant linear layer: mixes channels within each (l, p) type.
    Edge-independent weights -> lowers to one big matmul per irrep type."""
    in_ir, out_ir = Irreps.parse(in_s), Irreps.parse(out_s)
    blocks = []
    w_off = 0
    for i3, (off3, mul3, ir3) in enumerate(out_ir.slices()):
        ins = [
            (off1, mul1)
            for (off1, mul1, ir1) in in_ir.slices()
            if ir1.l == ir3.l and ir1.p == ir3.p
        ]
        n_in = sum(m for _, m in ins)
        if n_in == 0:
            continue
        blocks.append((tuple(ins), i3, w_off, n_in, mul3))
        w_off += n_in * mul3
    return LinearSpec(in_ir, out_ir, tuple(blocks), w_off)


def linear_weight_init(key, spec: LinearSpec):
    import jax

    ws = []
    for ins, i3, w_off, n_in, mul3 in spec.blocks:
        key, k = jax.random.split(key)
        ws.append(
            jax.random.normal(k, (n_in * mul3,)) / np.sqrt(max(n_in, 1))
        )
    return jnp.concatenate(ws) if ws else jnp.zeros((0,))


def apply_linear(spec: LinearSpec, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """y[..., out] = per-irrep-type channel mixing; one MXU matmul per type."""
    lead = x.shape[:-1]
    outs = {b[1]: None for b in spec.blocks}
    for ins, i3, w_off, n_in, mul3 in spec.blocks:
        off3, mul3_, ir3 = spec.out_irreps.slices()[i3]
        d = ir3.dim
        cols = [
            x[..., o : o + m * d].reshape(lead + (m, d)) for o, m in ins
        ]
        xin = jnp.concatenate(cols, axis=-2)  # [E, n_in, d]
        W = w[w_off : w_off + n_in * mul3].reshape(n_in, mul3)
        y = jnp.einsum("...ud,uw->...wd", xin, W)
        outs[i3] = y.reshape(lead + (mul3 * d,))
    parts = []
    for i3, (off, mul, ir) in enumerate(spec.out_irreps.slices()):
        if i3 in outs and outs[i3] is not None:
            parts.append(outs[i3])
        else:
            parts.append(jnp.zeros(lead + (mul * ir.dim,), x.dtype))
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def compile_full_tensor_product(
    in1_s: str, in2_s: str, lmax_out: int | None = None
) -> TensorProductSpec:
    """Unweighted full tensor product (e3nn FullTensorProduct): every allowed
    (i1, i2) -> l3 coupling becomes its own output irrep with mul1*mul2
    multiplicity. Optionally truncated at lmax_out (downstream convs only
    consume low-l components; see tpscore.py:373)."""
    in1, in2 = Irreps.parse(in1_s), Irreps.parse(in2_s)
    out_items = []
    raw = []
    for i1, (off1, mul1, ir1) in enumerate(in1.slices()):
        for i2, (off2, mul2, ir2) in enumerate(in2.slices()):
            for l3 in range(abs(ir1.l - ir2.l), ir1.l + ir2.l + 1):
                if lmax_out is not None and l3 > lmax_out:
                    continue
                p3 = ir1.p * ir2.p
                i3 = len(out_items)
                out_items.append((mul1 * mul2, Irrep(l3, p3)))
                raw.append((i1, i2, i3, off1, off2, mul1, mul2, ir1.l, ir2.l, l3))
    out = Irreps(tuple(out_items))
    paths = []
    for r in raw:
        i1, i2, i3, s1, s2, mul1, mul2, l1, l2, l3 = r
        s3 = out.slices()[i3][0]
        alpha = float(np.sqrt(2 * l3 + 1))
        paths.append(
            TPPath(i1, i2, i3, s1, s2, s3, mul1, mul2, mul1 * mul2, l1, l2, l3, 0, alpha)
        )
    return TensorProductSpec(in1, in2, out, tuple(paths), 0)


def apply_full_tensor_product(
    spec: TensorProductSpec, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    out_parts = []
    for p in spec.paths:
        d1, d2, d3 = 2 * p.l1 + 1, 2 * p.l2 + 1, 2 * p.l3 + 1
        a = x1[..., p.s1 : p.s1 + p.mul1 * d1].reshape(x1.shape[:-1] + (p.mul1, d1))
        b = x2[..., p.s2 : p.s2 + p.mul2 * d2].reshape(x2.shape[:-1] + (p.mul2, d2))
        C = jnp.asarray(clebsch_gordan(p.l1, p.l2, p.l3), dtype=x1.dtype)
        y = jnp.einsum("...ui,...vj,ijk->...uvk", a, b, C) * p.alpha
        out_parts.append(y.reshape(y.shape[:-3] + (p.mul1 * p.mul2 * d3,)))
    return jnp.concatenate(out_parts, axis=-1)


def rotate_features(irreps: Irreps, feat: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Rotate a flat irreps feature vector by R (numpy; for tests).

    Parity is ignored (proper rotations only)."""
    out = np.array(feat, copy=True)
    for off, mul, ir in irreps.slices():
        d = ir.dim
        block = feat[..., off : off + mul * d].reshape(feat.shape[:-1] + (mul, d))
        D = wigner_d_real(ir.l, R)
        out[..., off : off + mul * d] = np.einsum("ij,...uj->...ui", D, block).reshape(
            feat.shape[:-1] + (mul * d,)
        )
    return out


def apply_linear_cm(spec: LinearSpec, x_cm: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """apply_linear on COMPONENT-MAJOR inputs/outputs (each slot stored as
    d contiguous [mul] blocks). Same weights as apply_linear; avoids the
    minor-dim transposes of converting layouts around the pallas kernels."""
    lead = x_cm.shape[:-1]
    parts = []
    slot_out = {b[1]: b for b in spec.blocks}
    for i3, (off3, mul3, ir3) in enumerate(spec.out_irreps.slices()):
        d = ir3.dim
        if i3 not in slot_out:
            parts.append(jnp.zeros(lead + (mul3 * d,), x_cm.dtype))
            continue
        ins, _, w_off, n_in, _ = slot_out[i3]
        W = w[w_off : w_off + n_in * mul3].reshape(n_in, mul3)
        for k in range(d):
            cols = []
            for o, m in ins:
                cols.append(x_cm[..., o + k * m : o + (k + 1) * m])
            xin = jnp.concatenate(cols, axis=-1)  # [.., n_in]
            parts.append(xin @ W)  # [.., mul3]
    return jnp.concatenate(parts, axis=-1)
