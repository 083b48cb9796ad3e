from . import rotations, kabsch, torsion, so3, torus, diffusion, conformer
