"""Generate the committed PDBBind-style fixture complexes under tests/fixtures/.

Three tiny synthetic complexes, each a ligand SDF (V2000, heavy atoms only,
with genuine rotatable bonds) plus a receptor PDB (ideal-helix backbone with
N/CA/C/O/CB atoms), laid out exactly like a PDBBind tree:

    tests/fixtures/pdbbind/<name>/<name>_ligand.sdf
    tests/fixtures/pdbbind/<name>/<name>_protein_processed.pdb
    tests/fixtures/splits/fixture_{train,val,test}

They are parseable by the built-in minichem fallback (no RDKit/BioPython
required), so the full two-phase confidence/AR training CLIs and the real-data
evaluation contract can run end-to-end in CI.  The geometry is synthetic but
respects the featurizer's requirements (complete N/CA/C residues, ligand near
the receptor, rotatable bonds whose removal splits the bond graph).

Deterministic: re-running reproduces the committed files byte-for-byte.
"""
from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FIXTURE_DIR = os.path.join(_REPO, "tests", "fixtures")


def hexagon(center, radius=1.39, z=0.0, phase=0.0):
    ang = phase + np.arange(6) * np.pi / 3
    return np.stack(
        [center[0] + radius * np.cos(ang), center[1] + radius * np.sin(ang),
         np.full(6, center[2] + z)], -1
    )


def ring_bonds(offset, n=6, order=4):
    return [(offset + i, offset + (i + 1) % n, order) for i in range(n)]


def make_ligand(kind: str):
    """Returns (elements, pos (N,3), bonds [(a,b,type)])."""
    if kind == "ether":  # phenyl-O-CH2-CH3: 2 rotatable bonds
        ring = hexagon((0.0, 0.0, 0.0))
        o = ring[0] + np.array([1.36, 0.0, 0.0])
        c7 = o + np.array([0.8, 1.2, 0.2])
        c8 = c7 + np.array([1.4, 0.3, -0.4])
        pos = np.concatenate([ring, [o], [c7], [c8]])
        elements = ["C"] * 6 + ["O", "C", "C"]
        bonds = ring_bonds(0) + [(0, 6, 1), (6, 7, 1), (7, 8, 1)]
    elif kind == "amide":  # CH3-CH2-C(=O)-NH-CH2-CH2-OH: 4 rotatable bonds
        pos = np.array([
            [0.0, 0.0, 0.0],     # C1
            [1.5, 0.2, 0.1],     # C2
            [2.3, 1.4, -0.2],    # C3 (carbonyl)
            [1.9, 2.5, -0.6],    # O4 (=O)
            [3.7, 1.3, 0.1],     # N5
            [4.6, 2.4, -0.1],    # C6
            [6.0, 2.0, 0.3],     # C7
            [6.8, 3.1, 0.1],     # O8
        ])
        elements = ["C", "C", "C", "O", "N", "C", "C", "O"]
        bonds = [(0, 1, 1), (1, 2, 1), (2, 3, 2), (2, 4, 1), (4, 5, 1),
                 (5, 6, 1), (6, 7, 1)]
    elif kind == "biring":  # phenyl-O-pyridyl: 2 rotatable bonds, 13 atoms
        ring_a = hexagon((0.0, 0.0, 0.0))
        o = ring_a[0] + np.array([1.36, 0.2, 0.0])
        ring_b = hexagon((o[0] + 2.2, o[1] + 0.6, 0.4), phase=0.3)
        pos = np.concatenate([ring_a, [o], ring_b])
        elements = ["C"] * 6 + ["O"] + ["C", "C", "N", "C", "C", "C"]
        bonds = ring_bonds(0) + [(0, 6, 1), (6, 7, 1)] + ring_bonds(7)
    else:
        raise ValueError(kind)
    return elements, np.asarray(pos, np.float64), bonds


def write_sdf(path, name, elements, pos, bonds):
    lines = [name, "  fixture", "",
             f"{len(elements):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000"]
    for e, p in zip(elements, pos):
        lines.append(
            f"{p[0]:10.4f}{p[1]:10.4f}{p[2]:10.4f} {e:<3s} 0  0  0  0  0  0  0  0  0  0  0  0"
        )
    for a, b, t in bonds:
        lines.append(f"{a + 1:3d}{b + 1:3d}{t:3d}  0")
    lines += ["M  END", "$$$$", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


AA_CYCLE = ["ALA", "SER", "LEU", "VAL", "THR", "GLY", "PHE", "ASP", "LYS",
            "GLU", "ARG", "TYR", "MET", "ILE", "PRO", "ASN"]


def make_helix(n_res: int, origin=np.zeros(3), seed: int = 0):
    """Alpha-helix-like backbone with broken screw symmetry.

    An IDEAL helix is a perfect screw: the receptor point cloud is invariant
    (to 0.00 A) under per-residue shifts, which makes the docking pose
    geometrically underdetermined -- a trained model finds z-translated
    near-copies of the binding site (caught by
    scripts/validate_fixture_training.py).  Deterministic per-residue jitter
    plus a progressive bend make every site geometrically unique.
    """
    rng = np.random.RandomState(seed)
    rise, turn, r_ca = 1.5, np.deg2rad(100.0), 2.3
    residues = []
    for i in range(n_res):
        th = i * turn
        z = i * rise
        # symmetry breakers: radius modulation, axis bend, positional jitter
        r_i = r_ca * (1.0 + 0.25 * np.sin(i * 0.9))
        bend = np.array([0.06 * i ** 1.5, 0.04 * i ** 1.4, 0.0])
        jit = rng.randn(3) * 0.5
        ca = origin + bend + jit + np.array([r_i * np.cos(th), r_i * np.sin(th), z])
        n = ca + np.array([1.2 * np.cos(th - 2.0), 1.2 * np.sin(th - 2.0), -0.9])
        c = ca + np.array([1.2 * np.cos(th + 2.0), 1.2 * np.sin(th + 2.0), 0.9])
        out_dir = np.array([np.cos(th), np.sin(th), 0.0])
        o = c + out_dir * 0.6 + np.array([0, 0, 0.9])
        cb = ca + out_dir * 1.5 + np.array([0, 0, 0.3])
        name = AA_CYCLE[i % len(AA_CYCLE)]
        atoms = [("N", "N", n), ("CA", "C", ca), ("C", "C", c), ("O", "O", o)]
        if name != "GLY":
            atoms.append(("CB", "C", cb))
        residues.append((name, atoms))
    return residues


def write_pdb(path, residues, chain="A"):
    lines = []
    serial = 1
    for ri, (resname, atoms) in enumerate(residues):
        for name, elem, p in atoms:
            # standard columns: name 13-16, resName 18-20, chainID 22,
            # resSeq 23-26, x at 31 (1-based PDB spec)
            lines.append(
                f"ATOM  {serial:5d}  {name:<3s} {resname:<3s} {chain}{ri + 1:4d}    "
                f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          {elem:>2s}"
            )
            serial += 1
    lines.append("TER")
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


COMPLEXES = [
    ("fix1", "ether", 20),
    ("fix2", "amide", 26),
    ("fix3", "biring", 32),
]


def main():
    for name, kind, n_res in COMPLEXES:
        d = os.path.join(FIXTURE_DIR, "pdbbind", name)
        os.makedirs(d, exist_ok=True)
        elements, lig_pos, bonds = make_ligand(kind)
        residues = make_helix(n_res, seed=sum(map(ord, name)))
        # place the ligand centroid near the helix surface at mid-height
        ca = np.stack([a[2] for r in residues for a in r[1] if a[0] == "CA"])
        target = ca.mean(0) + np.array([6.0, 0.0, 0.0])
        lig_pos = lig_pos - lig_pos.mean(0) + target
        write_sdf(os.path.join(d, f"{name}_ligand.sdf"), name, elements, lig_pos, bonds)
        write_pdb(os.path.join(d, f"{name}_protein_processed.pdb"), residues)

    # deterministic per-residue "language-model" embeddings (stand-in for the
    # ESM2 pipeline the shipped models train with): a receptor with NO node
    # embeddings is nearly featureless and the overfit validation stalls at
    # ~7 A; with per-residue embeddings it converges to ~1.4 A
    # (scripts/validate_fixture_training.py).  Same npz format as
    # data/esm.py combine_embeddings.
    esm = {}
    for name, kind, n_res in COMPLEXES:
        rng = np.random.RandomState(1000 + sum(map(ord, name)))
        esm[name] = rng.randn(n_res, 16).astype(np.float32)
    np.savez_compressed(os.path.join(FIXTURE_DIR, "esm_fixture.npz"), **esm)

    os.makedirs(os.path.join(FIXTURE_DIR, "splits"), exist_ok=True)
    with open(os.path.join(FIXTURE_DIR, "splits", "fixture_train"), "w") as f:
        f.write("fix1\nfix2\n")
    with open(os.path.join(FIXTURE_DIR, "splits", "fixture_val"), "w") as f:
        f.write("fix3\n")
    with open(os.path.join(FIXTURE_DIR, "splits", "fixture_test"), "w") as f:
        f.write("fix3\n")

    # validation pass: featurize each complex through the real pipeline
    from disco_diffdock_tpu.data import featurize

    for name, kind, n_res in COMPLEXES:
        d = os.path.join(FIXTURE_DIR, "pdbbind", name)
        mol = featurize.read_molecule(os.path.join(d, f"{name}_ligand.sdf"))
        lig = featurize.ligand_graph(mol)
        receptor = featurize.receptor_from_pdb(
            os.path.join(d, f"{name}_protein_processed.pdb"), lig["lig_pos"]
        )
        rec = featurize.build_complex_record(
            mol, receptor, matching=True, popsize=6, maxiter=4,
            all_atoms=True, name=name,
        )
        print(f"{name}: lig={len(rec['lig_pos'])} res={len(rec['rec_pos'])} "
              f"rot_bonds={len(rec['tor_edges'])} atoms={len(rec['atom_pos'])} "
              f"rec_edges={len(rec['rec_src'])}")
        assert len(rec["tor_edges"]) >= 2, f"{name} must have rotatable bonds"
        assert len(rec["rec_pos"]) == n_res
    print("fixtures OK")


if __name__ == "__main__":
    main()
