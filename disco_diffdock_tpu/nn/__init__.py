from . import irreps, sh, cg, tensor_product, batchnorm, basic, conv
