"""Weight-layout transforms between e3nn tensor products and ours.

The reference stores every tensor-product weight inside the edge MLP's final
``nn.Linear`` (rows = flat TP-weight indices).  Three layout regimes exist:

  1. **FasterTensorProduct** (reference models/tensor_layers.py:39-116, used
     by every sh_lmax=1 trunk conv): per-output-block ``(fan, out_mul)``
     blocks in irrep order -- byte-identical to our
     ``WeightedTensorProduct``'s "fo" layout (nn/tensor_product.py), so the
     transform is the identity.
  2. **o3.FullyConnectedTensorProduct** (``final_conv``/``tor_bond_conv`` of
     every model, all convs of the sh_lmax=2 AR trunk and the all-atom
     confidence model): flat concatenation over e3nn *instructions* in
     ``(i_in, i_sh, i_out)`` loop order, each block ``(mul_in, 1, mul_out)``
     row-major.  Ours groups by output block instead -> a permutation.
  3. **Per-path signs**: our CG tensors (nn/cg.py) equal e3nn's wigner_3j up
     to a sign per (l1,l2,l3) (interop/e3nn_basis.py ``path_sign``); the sign
     multiplies the affected weight rows.

``o3.FullTensorProduct`` (the torsion head's bond-axis product,
models/score_model.py:152) additionally *sorts* its output irreps while ours
keeps generation order, and its per-block values carry the same CG signs;
:func:`full_tp_block_map` provides the block correspondence and signs that
compose into the downstream conv transform.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..nn.irreps import Irreps
from ..nn.tensor_product import WeightedTensorProduct
from .e3nn_basis import path_sign

__all__ = [
    "e3nn_sort_key",
    "full_tp_block_map",
    "fctp_weight_transform",
    "faster_weight_numel",
]


def e3nn_sort_key(ir) -> tuple:
    """e3nn's canonical irrep ordering: 0e < 0o < 1o < 1e < 2e < 2o < ...
    (key = (l, -p * (-1)**l); e3nn o3/_irreps.py Irrep.__lt__)."""
    return (ir.l, -ir.p * (-1) ** ir.l)


@dataclasses.dataclass(frozen=True)
class FullTPInfo:
    """Correspondence between our FullTensorProduct output and e3nn's.

    ``e3nn_irreps``: e3nn's sorted output irreps as (mul, l, p) tuples
    (including blocks ours drops beyond lmax_out).
    ``ours_to_e3nn``: for each of our output blocks (generation order), the
    index of the corresponding e3nn sorted block.
    ``block_signs``: per our-block sign relating our block VALUES to e3nn's
    (ours_b = sign_b * D(R0)-rotated e3nn_b; the rotation never appears in
    weight transforms -- see e3nn_basis module docstring).
    """

    e3nn_irreps: tuple
    ours_to_e3nn: tuple
    block_signs: tuple


def full_tp_block_map(irreps1, irreps2, lmax_out: int = 3) -> FullTPInfo:
    """Replicates e3nn o3.FullTensorProduct's output ordering.

    e3nn generates paths in (i1, i2, l3-ascending) order then stably sorts
    the output irreps by :func:`e3nn_sort_key`; ours (nn/tensor_product.py
    FullTensorProduct) keeps generation order and drops l3 > lmax_out.
    """
    irreps1, irreps2 = Irreps(irreps1), Irreps(irreps2)
    gen = []  # (mul, l3, p3, ours_index or None, sign)
    ours_count = 0
    for mi1 in irreps1:
        for mi2 in irreps2:
            assert mi2.mul == 1, "sh-side multiplicities must be 1"
            p3 = mi1.ir.p * mi2.ir.p
            for l3 in range(abs(mi1.ir.l - mi2.ir.l), mi1.ir.l + mi2.ir.l + 1):
                if l3 <= lmax_out:
                    ours_idx = ours_count
                    ours_count += 1
                    sign = path_sign(mi1.ir.l, mi2.ir.l, l3)
                else:
                    ours_idx, sign = None, 1.0
                gen.append((mi1.mul, l3, p3, ours_idx, sign))

    class _Ir:
        def __init__(self, l, p):
            self.l, self.p = l, p

    order = sorted(range(len(gen)), key=lambda g: e3nn_sort_key(_Ir(gen[g][1], gen[g][2])))
    e3nn_irreps = tuple((gen[g][0], gen[g][1], gen[g][2]) for g in order)
    ours_to_e3nn = [None] * ours_count
    signs = [1.0] * ours_count
    for pos, g in enumerate(order):
        _, _, _, ours_idx, sign = gen[g]
        if ours_idx is not None:
            ours_to_e3nn[ours_idx] = pos
            signs[ours_idx] = sign
    return FullTPInfo(e3nn_irreps, tuple(ours_to_e3nn), tuple(signs))


def _as_blocks(irreps) -> list:
    """Normalize an irreps spec or (mul, l, p) tuple list to (mul, l, p)."""
    if isinstance(irreps, (list, tuple)) and irreps and isinstance(irreps[0], tuple):
        return [tuple(b) for b in irreps]
    return [(mi.mul, mi.ir.l, mi.ir.p) for mi in Irreps(irreps)]


def fctp_weight_transform(
    in_irreps,
    sh_irreps_ours,
    out_irreps,
    sh_irreps_e3nn=None,
    sh_block_map=None,
    sh_block_signs=None,
):
    """(perm, signs) turning e3nn FCTP flat weights into our "fo" layout.

    ``ours_flat[i] = signs[i] * e3nn_flat[perm[i]]``.

    e3nn side: ``o3.FullyConnectedTensorProduct(in, sh, out,
    shared_weights=False)`` -- instructions in (i_in, i_sh, i_out) loop order
    (e3nn o3/_sub.py), each weight block (mul_in, 1, mul_out) row-major.
    Our side: ``WeightedTensorProduct(in, sh, out)`` "fo" layout.

    When the conv's sh input comes from a FullTensorProduct whose block
    *order* differs between the frameworks (the torsion head), pass e3nn's
    sh irreps plus ``sh_block_map`` (our sh block -> e3nn sh block index) and
    ``sh_block_signs`` (sign of our sh block VALUES vs e3nn's); they compose
    into the returned row signs.
    """
    in_blocks = _as_blocks(in_irreps)
    ours_sh = _as_blocks(sh_irreps_ours)
    e3nn_sh = _as_blocks(sh_irreps_e3nn) if sh_irreps_e3nn is not None else ours_sh
    out_blocks = _as_blocks(out_irreps)
    if sh_block_map is None:
        assert ours_sh == e3nn_sh, "sh irreps differ; pass sh_block_map"
        sh_block_map = list(range(len(ours_sh)))
    if sh_block_signs is None:
        sh_block_signs = [1.0] * len(ours_sh)

    def compatible(b1, b2, b3):
        _, l1, p1 = b1
        _, l2, p2 = b2
        _, l3, p3 = b3
        return p1 * p2 == p3 and abs(l1 - l2) <= l3 <= l1 + l2

    # e3nn flat offsets per instruction (i_in, i_sh, i_out)
    e3nn_ofs = {}
    ofs = 0
    for i1, b1 in enumerate(in_blocks):
        for i2, b2 in enumerate(e3nn_sh):
            assert b2[0] == 1
            for i3, b3 in enumerate(out_blocks):
                if compatible(b1, b2, b3):
                    e3nn_ofs[(i1, i2, i3)] = ofs
                    ofs += b1[0] * b3[0]
    numel = ofs

    # our side: reuse WeightedTensorProduct's own path enumeration so the
    # transform can never drift from the runtime layout
    ours_spec = " + ".join(f"{m}x{l}{'e' if p > 0 else 'o'}" for m, l, p in in_blocks)
    sh_spec = " + ".join(f"{m}x{l}{'e' if p > 0 else 'o'}" for m, l, p in ours_sh)
    out_spec = " + ".join(f"{m}x{l}{'e' if p > 0 else 'o'}" for m, l, p in out_blocks)
    wtp = WeightedTensorProduct(ours_spec, sh_spec, out_spec)
    assert wtp.weight_numel == numel, (wtp.weight_numel, numel)

    perm = np.zeros(numel, dtype=np.int64)
    signs = np.zeros(numel, dtype=np.float64)
    ofs_ours = 0
    for k, out_mi in enumerate(wtp.out_irreps):
        out_mul = out_mi.mul
        row = 0
        for path in wtp.paths[k]:
            i1, j_ours = path.in_block, path.sh_block
            mul_in, l1, _ = in_blocks[i1]
            _, l2, _ = ours_sh[j_ours]
            j_e3nn = sh_block_map[j_ours]
            base = e3nn_ofs[(i1, j_e3nn, k)]
            s = path_sign(l1, l2, out_mi.ir.l) * sh_block_signs[j_ours]
            for u in range(mul_in):
                for w in range(out_mul):
                    ours_idx = ofs_ours + (row + u) * out_mul + w
                    perm[ours_idx] = base + u * out_mul + w
                    signs[ours_idx] = s
            row += mul_in
        ofs_ours += wtp.weight_splits[k]
    assert ofs_ours == numel
    # bijectivity
    assert len(set(perm.tolist())) == numel
    return perm, signs


def faster_weight_numel(in_irreps, out_irreps) -> int:
    """weight_numel of the reference FasterTensorProduct (tensor_layers.py:57-64)
    == our WeightedTensorProduct with sh '1x0e+1x1o' (identity layout)."""
    return WeightedTensorProduct(in_irreps, "1x0e + 1x1o", out_irreps).weight_numel
