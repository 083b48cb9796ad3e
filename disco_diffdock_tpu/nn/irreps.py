"""Minimal irreducible-representation bookkeeping for O(3) feature vectors.

The reference expresses feature types as e3nn irreps strings such as
``"24x0e + 6x1o + 6x1e + 24x0o"`` (models/tensor_layers.py:12-36).  This module
is a dependency-free replacement: an ``Irreps`` is an ordered tuple of
``(mul, l, parity)`` with flat-layout slices (block order is exactly the
string order, each block ``mul * (2l+1)`` wide, m-major within a channel).
"""
from __future__ import annotations

import dataclasses
import re


@dataclasses.dataclass(frozen=True)
class Irrep:
    l: int
    p: int  # +1 even, -1 odd

    def __str__(self):
        return f"{self.l}{'e' if self.p == 1 else 'o'}"

    @property
    def dim(self) -> int:
        return 2 * self.l + 1


@dataclasses.dataclass(frozen=True)
class MulIrrep:
    mul: int
    ir: Irrep

    @property
    def dim(self) -> int:
        return self.mul * self.ir.dim


class Irreps(tuple):
    """Ordered collection of (mul, Irrep), parsed from e3nn-style strings."""

    def __new__(cls, spec):
        if isinstance(spec, Irreps):
            return spec
        if isinstance(spec, str):
            items = []
            for part in spec.replace(" ", "").split("+"):
                if not part:
                    continue
                m = re.fullmatch(r"(?:(\d+)x)?(\d+)([eo])", part)
                if not m:
                    raise ValueError(f"bad irrep '{part}' in '{spec}'")
                mul = int(m.group(1)) if m.group(1) else 1
                items.append(MulIrrep(mul, Irrep(int(m.group(2)), 1 if m.group(3) == "e" else -1)))
            return super().__new__(cls, items)
        return super().__new__(cls, [MulIrrep(m, Irrep(l, p)) for (m, l, p) in spec])

    @property
    def dim(self) -> int:
        return sum(mi.dim for mi in self)

    def slices(self) -> list[slice]:
        out, i = [], 0
        for mi in self:
            out.append(slice(i, i + mi.dim))
            i += mi.dim
        return out

    def mul_dict(self) -> dict[str, int]:
        """Total multiplicity per irrep type (e.g. {'0e': 24, '1o': 6})."""
        d: dict[str, int] = {}
        for mi in self:
            d[str(mi.ir)] = d.get(str(mi.ir), 0) + mi.mul
        return d

    def __repr__(self):
        return "+".join(f"{mi.mul}x{mi.ir}" for mi in self)


def spherical_harmonics_irreps(lmax: int) -> Irreps:
    """SH irreps 1x0e+1x1o+1x2e+... (parity (-1)^l)."""
    return Irreps([(1, l, (-1) ** l) for l in range(lmax + 1)])
