"""Verify the checkpoint importer's e3nn-convention replica against REAL e3nn.

This environment (and this framework) does not depend on e3nn; the importer's
correctness for the non-"faster" tensor products rests on a first-principles
replica of e3nn's real-basis conventions (disco_diffdock_tpu/interop/
e3nn_basis.py).  Everything verifiable without e3nn is already covered by
tests/test_interop_basis.py and tests/test_torch_import.py; this script is
the final bridge: run it in ANY environment that has ``e3nn`` installed
(e.g. the reference's own conda env) to machine-check the replica against the
real thing:

    python scripts/verify_torch_import.py

Checks, hardest-to-trust first:
  1. wigner_3j(l1,l2,l3) == o3.wigner_3j(l1,l2,l3) for all l <= 3 triples
     (exact sign conventions -- the one thing memory of e3nn's source could
     get wrong).
  2. sh_e3nn == o3.spherical_harmonics(normalize=True,
     normalization='component') for l <= 3.
  3. End-to-end: o3.FullyConnectedTensorProduct(shared_weights=False) forward
     == our WeightedTensorProduct with fctp_weight_transform-mapped weights,
     through the numerically-fit basis transport, for a battery of irreps
     combinations including second-order reps.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    try:
        import torch
        from e3nn import o3
    except ImportError as e:
        raise SystemExit(
            f"this script needs e3nn + torch installed ({e}); run it in the "
            "reference's environment"
        )

    from disco_diffdock_tpu.interop.e3nn_basis import sh_e3nn, wigner_3j
    from disco_diffdock_tpu.interop.tp_layout import fctp_weight_transform
    from disco_diffdock_tpu.nn.irreps import Irreps
    from disco_diffdock_tpu.nn.sh import sh_numpy
    from disco_diffdock_tpu.nn.tensor_product import WeightedTensorProduct

    failures = []

    # 1. wigner_3j signs/values
    for l1 in range(4):
        for l2 in range(4):
            for l3 in range(4):
                if not abs(l1 - l2) <= l3 <= l1 + l2:
                    continue
                theirs = o3.wigner_3j(l1, l2, l3).numpy()
                ours = wigner_3j(l1, l2, l3)
                err = np.abs(ours - theirs).max()
                if err > 1e-6:
                    failures.append(f"wigner_3j({l1},{l2},{l3}): max err {err}")
    print(f"wigner_3j: {'OK' if not failures else 'MISMATCH'}")

    # 2. spherical harmonics table
    rng = np.random.RandomState(0)
    v = rng.randn(128, 3).astype(np.float64)
    theirs = o3.spherical_harmonics(
        o3.Irreps.spherical_harmonics(3), torch.from_numpy(v), normalize=True,
        normalization="component",
    ).numpy()
    ours = sh_e3nn(v, 3)
    err = np.abs(ours - theirs).max()
    print(f"spherical_harmonics l<=3: max err {err:.2e}")
    if err > 1e-6:
        failures.append(f"sh table: max err {err}")

    # 3. FCTP forward through the weight transform
    def transport(l):
        pts = rng.randn(6 * (2 * l + 1), 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        lo = l * l
        A = sh_e3nn(pts, l)[:, lo:]
        B = sh_numpy(pts, l)[:, lo:]
        T = np.linalg.lstsq(A, B, rcond=None)[0].T
        assert np.abs(T @ A.T - B.T).max() < 1e-8
        return T

    def transport_features(irreps, x):
        out = np.zeros_like(x)
        for mi, sl in zip(Irreps(irreps), Irreps(irreps).slices()):
            b = x[..., sl].reshape(x.shape[:-1] + (mi.mul, mi.ir.dim))
            b = np.einsum("kj,...uj->...uk", transport(mi.ir.l), b)
            out[..., sl] = b.reshape(x.shape[:-1] + (mi.mul * mi.ir.dim,))
        return out

    import jax.numpy as jnp

    CASES = [
        ("4x0e + 2x1o + 2x1e + 4x0o", 1, "4x0e + 2x1o + 2x1e + 4x0o"),
        ("4x0e + 2x1o + 2x1e + 4x0o", 1, "2x1o + 2x1e"),
        ("4x0e + 2x1o + 2x1e + 4x0o", 2, "4x0e + 2x1o + 2x1e + 4x0o"),
        ("3x0e + 2x1o + 2x2e + 2x1e + 2x2o + 3x0o", 2,
         "3x0e + 2x1o + 2x2e + 2x1e + 2x2o + 3x0o"),
    ]
    for in_ir, lmax, out_ir in CASES:
        sh_ir = " + ".join(["1x0e"] + [f"1x{l}{'eo'[l % 2]}"
                                       for l in range(1, lmax + 1)])
        tp = o3.FullyConnectedTensorProduct(
            o3.Irreps(in_ir.replace(" ", "")), o3.Irreps(sh_ir.replace(" ", "")),
            o3.Irreps(out_ir.replace(" ", "")), shared_weights=False,
        )
        E = 5
        x = rng.randn(E, o3.Irreps(in_ir.replace(" ", "")).dim)
        vv = rng.randn(E, 3)
        sh_ref = o3.spherical_harmonics(
            o3.Irreps.spherical_harmonics(lmax), torch.from_numpy(vv),
            normalize=True, normalization="component",
        ).numpy()
        w = rng.randn(E, tp.weight_numel)
        ref_out = tp(torch.from_numpy(x), torch.from_numpy(sh_ref),
                     torch.from_numpy(w)).detach().numpy()

        perm, signs = fctp_weight_transform(in_ir, sh_ir, out_ir)
        assert len(perm) == tp.weight_numel
        wtp = WeightedTensorProduct(in_ir, sh_ir, out_ir)
        ours_out = np.asarray(
            wtp(jnp.asarray(transport_features(in_ir, x)),
                jnp.asarray(sh_numpy(vv, lmax)),
                jnp.asarray(w[:, perm] * signs))
        )
        err = np.abs(ours_out - transport_features(out_ir, ref_out)).max()
        print(f"FCTP {in_ir} (x) sh{lmax} -> {out_ir}: max err {err:.2e}")
        if err > 1e-4:
            failures.append(f"FCTP {in_ir}/{lmax}/{out_ir}: max err {err}")

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(" -", f)
        raise SystemExit(1)
    print("\nALL CHECKS PASSED: the importer's e3nn replica matches real e3nn.")


if __name__ == "__main__":
    main()
