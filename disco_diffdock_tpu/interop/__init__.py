"""Interop with the reference PyTorch/e3nn implementation.

Checkpoint import/export between reference ``state_dict`` files
(torch, e3nn conventions) and this framework's flax parameter trees:

  * :mod:`e3nn_basis` -- a first-principles numpy replica of e3nn's real
    spherical-harmonic basis and ``wigner_3j`` tensors, plus the orthogonal
    basis-change matrices to this framework's SH basis (``nn/sh.py``).
  * :mod:`tp_layout` -- per-path weight-index permutations and signs between
    e3nn's instruction-ordered ``FullyConnectedTensorProduct`` weight layout
    and this framework's per-output-block layout (``nn/tensor_product.py``).
  * :mod:`torch_import` -- ``state_dict`` <-> flax variables for every
    shipped model family (CG score model / wrapper+encoder, all-atom
    confidence model, AR prior).
"""
