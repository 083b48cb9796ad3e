"""PDB trajectory writer for denoising visualization.

Parity with utils/visualise.py:10-52 (``PDBFile``): multi-model PDB files,
one MODEL per trajectory frame, HETATM records for ligand atoms; latent
anchor positions can be appended as pseudo-atoms (evaluate.py:344-390).
"""
from __future__ import annotations

import numpy as np

_Z_TO_SYMBOL = {
    1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 14: "Si", 15: "P",
    16: "S", 17: "Cl", 34: "Se", 35: "Br", 53: "I",
}


class PDBTrajectory:
    def __init__(self, elements: np.ndarray | list):
        # elements: atomic numbers or symbols
        self.symbols = [
            _Z_TO_SYMBOL.get(int(e), "C") if not isinstance(e, str) else e
            for e in elements
        ]
        self.frames: list[np.ndarray] = []
        self.extra: list[np.ndarray | None] = []

    def add(self, pos: np.ndarray, latent_pos: np.ndarray | None = None):
        self.frames.append(np.asarray(pos))
        self.extra.append(None if latent_pos is None else np.asarray(latent_pos))

    def write(self, path: str):
        lines = []
        for mi, pos in enumerate(self.frames):
            lines.append(f"MODEL     {mi + 1:4d}")
            serial = 1
            for sym, p in zip(self.symbols, pos):
                # standard columns: name 13-16, resName 18-20, chainID 22,
                # resSeq 23-26, x at 31 (1-based PDB spec)
                lines.append(
                    f"HETATM{serial:5d} {sym:<4s} LIG A   1    "
                    f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          {sym:>2s}"
                )
                serial += 1
            if self.extra[mi] is not None:
                for p in self.extra[mi]:
                    lines.append(
                        f"HETATM{serial:5d} X    LAT B   1    "
                        f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00           X"
                    )
                    serial += 1
            lines.append("ENDMDL")
        lines.append("END")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
