"""Minimal dependency-free chemistry parsers (SDF V2000 / PDB).

Fallback for environments without RDKit/BioPython (such as this build image):
``data/featurize.py`` prefers RDKit/BioPython when importable and degrades to
these parsers otherwise.  Ligand chemical features that need real perception
(hybridization, implicit Hs, chirality) are *approximated* from the explicit
graph and flagged as such -- the production path is RDKit.
"""
from __future__ import annotations

import dataclasses

import networkx as nx
import numpy as np

from .features import ALLOWABLE_FEATURES, safe_index

# RDKit PeriodicTable valence LISTS for implicit-H estimation (ascending;
# the implicit count comes from the first row fitting the explicit valence)
_VALENCE_LISTS = {
    "H": (1,), "B": (3,), "C": (4,), "N": (3,), "O": (2,), "F": (1,),
    "Al": (3,), "Si": (4,), "P": (3, 5), "S": (2, 4, 6), "Cl": (1,),
    "Ga": (3,), "Ge": (4,), "As": (3, 5), "Se": (2, 4, 6), "Br": (1,),
    "Sn": (4,), "Sb": (3, 5), "Te": (2, 4, 6), "I": (1,),
}
_ELEMENT_Z = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16,
    "CL": 17, "BR": 35, "I": 53, "SE": 34, "SI": 14, "FE": 26, "ZN": 30,
    "MG": 12, "MN": 25, "CA": 20, "NA": 11, "K": 19, "CU": 29, "CO": 27, "NI": 28,
}


@dataclasses.dataclass
class MiniMol:
    elements: list[str]
    pos: np.ndarray  # (N, 3)
    bonds: np.ndarray  # (E, 2) 0-based unique pairs
    bond_types: np.ndarray  # (E,) 1/2/3/4(=aromatic)
    charges: np.ndarray  # (N,)
    # original (Kekule) bond orders, kept when perceive_aromaticity upgrades
    # ring bonds to type 4: valence/H-count math needs the localized orders
    # (RDKit likewise computes valence on the Kekule form)
    kekule_types: "np.ndarray | None" = None

    def remove_hs(self) -> "MiniMol":
        keep = [i for i, e in enumerate(self.elements) if e.upper() != "H"]
        remap = {o: n for n, o in enumerate(keep)}
        kek = self.kekule_types if self.kekule_types is not None else self.bond_types
        bonds, types, ktypes = [], [], []
        for (a, b), t, kt in zip(self.bonds, self.bond_types, kek):
            if a in remap and b in remap:
                bonds.append((remap[a], remap[b]))
                types.append(t)
                ktypes.append(kt)
        return MiniMol(
            elements=[self.elements[i] for i in keep],
            pos=self.pos[keep],
            bonds=np.asarray(bonds, np.int32).reshape(-1, 2),
            bond_types=np.asarray(types, np.int32),
            charges=self.charges[keep],
            kekule_types=(np.asarray(ktypes, np.int32)
                          if self.kekule_types is not None else None),
        )


def parse_sdf(path_or_text: str) -> MiniMol:
    """Parse the first molecule of an SDF/MOL V2000 block."""
    if "\n" in path_or_text:
        lines = path_or_text.splitlines()
    else:
        with open(path_or_text) as f:
            lines = f.read().splitlines()
    counts = lines[3]
    na, nb = int(counts[0:3]), int(counts[3:6])
    elements, pos = [], []
    for i in range(na):
        L = lines[4 + i]
        pos.append([float(L[0:10]), float(L[10:20]), float(L[20:30])])
        elements.append(L[31:34].strip())
    bonds, types = [], []
    for i in range(nb):
        L = lines[4 + na + i]
        a, b, t = int(L[0:3]) - 1, int(L[3:6]) - 1, int(L[6:9])
        bonds.append((a, b))
        types.append(t)
    charges = np.zeros(na)
    for L in lines[4 + na + nb :]:
        if L.startswith("M  CHG"):
            vals = L.split()[3:]
            for j in range(0, len(vals), 2):
                charges[int(vals[j]) - 1] = int(vals[j + 1])
        if L.startswith("M  END"):
            break
    return MiniMol(elements, np.asarray(pos, np.float32),
                   np.asarray(bonds, np.int32).reshape(-1, 2),
                   np.asarray(types, np.int32), charges)


_MOL2_BOND_TYPE = {"1": 1, "2": 2, "3": 3, "am": 1, "ar": 4, "du": 1, "un": 1, "nc": 0}

# single-bond covalent radii (A) for distance-based bond inference on
# formats without a bond table (pdbqt; pdb without CONECT)
_COVALENT_RADIUS = {
    "H": 0.31, "B": 0.84, "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57,
    "SI": 1.11, "P": 1.07, "S": 1.05, "CL": 1.02, "BR": 1.20, "I": 1.39,
    "SE": 1.20, "FE": 1.32, "ZN": 1.22, "MG": 1.41, "MN": 1.39, "CA": 1.76,
    "NA": 1.66, "K": 2.03, "CU": 1.32, "CO": 1.26, "NI": 1.24,
}


def _read_lines(path_or_text: str) -> list[str]:
    if "\n" in path_or_text:
        return path_or_text.splitlines()
    with open(path_or_text) as f:
        return f.read().splitlines()


def parse_mol2(path_or_text: str) -> MiniMol:
    """Parse the first molecule of a TRIPOS MOL2 file (the format the
    reference reads via Chem.MolFromMol2File, process_mols.py:491-492).

    Elements come from the SYBYL atom type (token before the '.'); bond
    types map ar->aromatic(4), am->amide(1), numeric as-is.
    """
    lines = _read_lines(path_or_text)
    section = None
    elements, pos, charges = [], [], []
    bonds, types = [], []
    id_map: dict[int, int] = {}
    for raw in lines:
        L = raw.strip()
        if L.startswith("@<TRIPOS>"):
            tag = L[len("@<TRIPOS>"):].upper()
            if tag == "MOLECULE" and elements:
                break  # only the first molecule
            section = tag
            continue
        if not L or section is None:
            continue
        if section == "ATOM":
            parts = L.split()
            # id name x y z type [subst_id subst_name charge]
            atom_id = int(parts[0])
            sybyl = parts[5]
            el = sybyl.split(".")[0]
            if el.upper() not in _ELEMENT_Z:  # e.g. 'Du' dummy: keep literal
                el = el[0:2] if el[0:2].upper() in _ELEMENT_Z else el[0]
            id_map[atom_id] = len(elements)
            elements.append(el)
            pos.append([float(parts[2]), float(parts[3]), float(parts[4])])
            charges.append(float(parts[8]) if len(parts) > 8 else 0.0)
        elif section == "BOND":
            parts = L.split()
            a, b, t = int(parts[1]), int(parts[2]), parts[3].lower()
            ti = _MOL2_BOND_TYPE.get(t, 1)
            if ti == 0:
                continue  # 'nc' not-connected records
            bonds.append((a, b))
            types.append(ti)
    bond_idx = np.asarray(
        [(id_map[a], id_map[b]) for a, b in bonds], np.int32
    ).reshape(-1, 2)
    return MiniMol(elements, np.asarray(pos, np.float32), bond_idx,
                   np.asarray(types, np.int32),
                   np.rint(np.asarray(charges)).astype(np.int32))


def infer_bonds(elements: list[str], pos: np.ndarray,
                tolerance: float = 0.45) -> np.ndarray:
    """Distance-based bond perception: a pair bonds when closer than the sum
    of covalent radii + tolerance (the fallback for bond-table-free formats;
    RDKit's PDB reader does the equivalent proximity perception)."""
    n = len(elements)
    radii = np.asarray(
        [_COVALENT_RADIUS.get(e.upper(), 0.77) for e in elements], np.float32)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    cut = radii[:, None] + radii[None, :] + tolerance
    cand = np.argwhere(np.triu(d < cut, k=1))
    # hydrogens bond only to their single nearest neighbor
    out = []
    h_taken: dict[int, tuple[int, float]] = {}
    for a, b in cand:
        a, b = int(a), int(b)
        if elements[a].upper() == "H" or elements[b].upper() == "H":
            h = a if elements[a].upper() == "H" else b
            if h not in h_taken or d[a, b] < h_taken[h][1]:
                h_taken[h] = ((a, b), d[a, b])
        else:
            out.append((a, b))
    out.extend(pair for pair, _ in h_taken.values())
    return np.asarray(sorted(out), np.int32).reshape(-1, 2)


def parse_pdb_ligand(path_or_text: str, pdbqt: bool = False) -> MiniMol:
    """Parse a small molecule from PDB/PDBQT ATOM/HETATM records.

    CONECT records supply bonds when present; otherwise bonds are inferred
    from covalent-radius distances.  PDBQT AutoDock types (A->aromatic C,
    OA/NA/SA->O/N/S, HD->H) are normalized to elements.  All bonds are
    single (orders are not stored in these formats; the reference's
    MolFromPDBBlock path is likewise order-free, process_mols.py:497-503).
    """
    lines = _read_lines(path_or_text)
    elements, pos = [], []
    serial_map: dict[int, int] = {}
    conect: list[tuple[int, int]] = []
    for L in lines:
        rec = L[:6].strip()
        if rec in ("ATOM", "HETATM"):
            serial = int(L[6:11])
            name = L[12:16].strip()
            el = L[76:78].strip() if len(L) >= 78 else ""
            if pdbqt or not el:
                # AutoDock atom types / fall back to the atom-name letters
                t = (el or name).upper()
                el = {"A": "C", "OA": "O", "NA": "N", "SA": "S", "HD": "H",
                      "HS": "H"}.get(t, None)
                if el is None:
                    t2 = "".join(c for c in name if c.isalpha()).upper()
                    el = t2[:2] if t2[:2] in _ELEMENT_Z else t2[:1]
            serial_map[serial] = len(elements)
            elements.append(el)
            pos.append([float(L[30:38]), float(L[38:46]), float(L[46:54])])
        elif rec == "CONECT":
            fields = [L[i:i + 5].strip() for i in range(6, min(len(L), 31), 5)]
            fields = [int(x) for x in fields if x]
            for b in fields[1:]:
                if fields[0] in serial_map and b in serial_map:
                    conect.append((min(fields[0], b), max(fields[0], b)))
    pos = np.asarray(pos, np.float32)
    if conect:
        bonds = np.asarray(
            sorted({(serial_map[a], serial_map[b]) for a, b in conect}),
            np.int32).reshape(-1, 2)
    else:
        bonds = infer_bonds(elements, pos)
    return MiniMol(elements, pos, bonds,
                   np.ones(len(bonds), np.int32),
                   np.zeros(len(elements), np.int32))


def write_sdf(mol: MiniMol, pos: np.ndarray, name: str = "mol") -> str:
    """Serialize with replaced coordinates (write_mol_with_coords analogue).

    Bonds are written with their Kekule orders (``kekule_types`` when
    aromaticity perception upgraded them — V2000 stores localized bonds) and
    formal charges as ``M  CHG`` records, so charged ligands round-trip
    instead of silently neutralizing (the reference writes through RDKit's
    SDWriter which preserves the charge block)."""
    lines = [name, "  disco_diffdock_tpu", "", f"{len(mol.elements):3d}{len(mol.bonds):3d}  0  0  0  0  0  0  0  0999 V2000"]
    for e, p in zip(mol.elements, pos):
        lines.append(f"{p[0]:10.4f}{p[1]:10.4f}{p[2]:10.4f} {e:<3s} 0  0  0  0  0  0  0  0  0  0  0  0")
    kek = mol.kekule_types if mol.kekule_types is not None else mol.bond_types
    for (a, b), t in zip(mol.bonds, kek):
        lines.append(f"{a + 1:3d}{b + 1:3d}{t:3d}  0")
    charged = [(i, int(c)) for i, c in enumerate(mol.charges) if int(c) != 0]
    for s in range(0, len(charged), 8):
        chunk = charged[s : s + 8]
        lines.append("M  CHG" + f"{len(chunk):3d}" + "".join(
            f" {i + 1:3d} {c:3d}" for i, c in chunk))
    lines += ["M  END", "$$$$", ""]
    return "\n".join(lines)


def atomic_number(element: str) -> int:
    return _ELEMENT_Z.get(element.upper(), -1)


def _implicit_h_count(element: str, z: int, charge: int,
                      explicit_valence: float) -> int:
    """RDKit's calculateImplicitValence (Atom.cpp): walk the element's
    allowed-valence LIST, shifted by formal charge, and return the headroom
    of the first row that fits the explicit (Kekule) valence.  Multi-valent
    S/P/Se/As/Te carry their hypervalent rows (S 2/4/6, P 3/5), so neutral S
    with three sigma bonds reads ONE implicit H (the valence-4 row), not
    zero; elements with no list (metals -- RDKit's list there is {-1},
    unconstrained) never gain implicit Hs.  The charge sign flips for early
    atoms (outer shell < 4 electrons: B-, Al-) and for positive carbon
    (RDKit GitHub #539), giving B- -> 4, C+ -> 3, N+ -> 4, O- -> 1,
    S+ -> 3/5/7."""
    valens = _VALENCE_LISTS.get(element.capitalize())
    if valens is None:
        return 0
    chg = charge
    if z > 1 and _valence_electrons(z) < 4:  # RDKit isEarlyAtom
        chg = -chg
    if z == 6 and chg > 0:
        chg = -chg
    ev = int(round(explicit_valence))
    for v in valens:
        if ev <= v + chg:
            return v + chg - ev
    return 0


def _valence_electrons(z: int) -> int:
    """Outer-shell electron count for main-group elements (the steric-number
    hybridization rule needs lone-pair counts).  Transition metals and
    lanthanides return 4 — their MiniMol hybridization lands on the same
    'misc'/SP3 bins either way."""
    if z <= 2:
        return z
    for core, width in ((2, 8), (10, 8), (18, 18), (36, 18), (54, 32)):
        if z <= core + width:
            g = z - core
            # main group after a d/f block: subtract the block width;
            # mid-block (transition/f) atoms get the neutral default
            if width == 18:
                if g > 10:
                    g -= 10
                elif g > 2:
                    return 4
            elif width == 32:
                if g > 24:
                    g -= 24
                elif g > 2:
                    return 4
            return g
    return 4


_AROMATIC_ELEMENTS = {"C", "N", "O", "S", "B", "P", "Se", "As", "Si"}


def perceive_aromaticity(mol: MiniMol) -> MiniMol:
    """Mark aromatic rings on Kekule input (Hueckel 4n+2 per SSSR ring).

    Real-world SDF files store localized single/double bonds; RDKit's
    SanitizeMol perceives aromaticity on read (the reference reads through it,
    process_mols.py:481-505), so without this pass the no-RDKit path would
    featurize every benzene as non-aromatic.  Approximation of RDKit's default
    model, per minimum-cycle-basis ring of size 5-7:

      * an atom with one in-ring double bond (or an existing aromatic bond)
        contributes 1 pi electron; two in-ring double bonds (cumulated) or a
        non-contributing saturated atom disqualify the ring
      * N/P with no double bond contribute their lone pair (2), as do 2-bonded
        O/S/Se (furan, thiophene); C- contributes 2, C+ and B contribute 0
      * an exocyclic double bond contributes 0 but keeps the atom eligible
        (quinones then fail 4n+2, matching RDKit's default model)

    Aromatic ring bonds are upgraded to type 4 with the original orders kept
    in ``kekule_types`` (valence math stays Kekule).  Rings are revisited to a
    fixpoint so fused systems (naphthalene, quinoline, acenes) perceive the
    same set whichever Kekule structure the file chose; multi-ring envelopes
    that are only aromatic as a whole (azulene) are still not combined --
    documented fallback approximation, the RDKit path is authoritative.
    Idempotent.
    """
    n = len(mol.elements)
    if n == 0 or len(mol.bonds) == 0:
        return mol
    btype: dict[tuple[int, int], int] = {}
    for (a, b), t in zip(mol.bonds, mol.bond_types):
        btype[(int(a), int(b))] = btype[(int(b), int(a))] = int(t)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(map(tuple, mol.bonds))
    try:
        rings = nx.minimum_cycle_basis(G)
    except Exception:
        rings = nx.cycle_basis(G)

    aromatic_pairs: set[tuple[int, int]] = set()

    def _ring_is_aromatic(rs: set) -> bool:
        if not 5 <= len(rs) <= 7:
            return False
        if any(mol.elements[i].capitalize() not in _AROMATIC_ELEMENTS for i in rs):
            return False
        pi = 0
        for i in rs:
            nbrs = list(G.neighbors(i))
            in_dbl = sum(1 for j in nbrs if j in rs and btype[(i, j)] == 2)
            ex_dbl = sum(1 for j in nbrs if j not in rs and btype[(i, j)] == 2)
            has_ar = any(
                btype[(i, j)] == 4
                or (min(i, j), max(i, j)) in aromatic_pairs
                for j in nbrs
            )
            el = mol.elements[i].capitalize()
            chg = int(mol.charges[i])
            if in_dbl >= 2:
                return False  # cumulated double bonds
            if in_dbl == 1 or has_ar:
                # one in-ring double, OR the atom already sits on an aromatic
                # bond — covers fused bridgeheads whose Kekule double lies in
                # the ADJACENT ring (naphthalene's second ring under the
                # unlucky Kekulization); resolved by the fixpoint loop below
                pi += 1
            elif ex_dbl >= 1:
                pi += 0  # sp2 with an empty in-ring contribution (quinones)
            elif el in ("N", "P", "As"):
                pi += 2  # pyrrole-type lone pair
            elif el in ("O", "S", "Se"):
                pi += 2  # furan / thiophene
            elif el == "C" and chg == -1:
                pi += 2  # cyclopentadienyl anion
            elif el == "C" and chg == 1:
                pi += 0  # tropylium
            elif el == "B":
                pi += 0  # empty p orbital
            else:
                return False  # saturated atom in the ring
        return pi % 4 == 2

    # fixpoint over the ring set: marking one ring aromatic can make a fused
    # neighbor pass (its bridgeheads now sit on aromatic bonds), whichever
    # Kekule structure the file chose
    ring_sets = [{int(i) for i in ring} for ring in rings]
    done: set[int] = set()
    changed = True
    while changed:
        changed = False
        for ri, rs in enumerate(ring_sets):
            if ri in done or not _ring_is_aromatic(rs):
                continue
            done.add(ri)
            changed = True
            for i in rs:
                for j in G.neighbors(i):
                    if j in rs:
                        aromatic_pairs.add((min(i, j), max(i, j)))

    if not aromatic_pairs:
        return mol
    kek = (mol.kekule_types if mol.kekule_types is not None
           else mol.bond_types).copy()
    new_types = mol.bond_types.copy()
    for e, (a, b) in enumerate(mol.bonds):
        if (min(int(a), int(b)), max(int(a), int(b))) in aromatic_pairs:
            new_types[e] = 4
    return dataclasses.replace(mol, bond_types=new_types, kekule_types=kek)


def ring_info(n_atoms: int, bonds: np.ndarray):
    """Per-atom ring membership via networkx minimum cycle basis (the closest
    stand-in for RDKit's SSSR: a plain spanning-tree cycle basis can report a
    10-cycle + 6-cycle for naphthalene where SSSR gives two 6-rings)."""
    G = nx.Graph()
    G.add_nodes_from(range(n_atoms))
    G.add_edges_from(map(tuple, bonds))
    try:
        cycles = nx.minimum_cycle_basis(G)
    except Exception:
        cycles = nx.cycle_basis(G)
    num_rings = np.zeros(n_atoms, np.int32)
    in_ring_size = {k: np.zeros(n_atoms, bool) for k in range(3, 9)}
    for cyc in cycles:
        for a in cyc:
            num_rings[a] += 1
            if 3 <= len(cyc) <= 8:
                in_ring_size[len(cyc)][a] = True
    return num_rings, in_ring_size


def featurize_minimol(mol: MiniMol) -> np.ndarray:
    """16-feature categorical codes approximating lig_atom_featurizer
    (process_mols.py:93-116).  Chirality is always UNSPECIFIED -- which is
    EXACT parity, not an approximation: the reference reads molecules with
    sanitize=False (process_mols.py:492-494) and never runs wedge/3D stereo
    assignment, so its GetChiralTag() is CHI_UNSPECIFIED throughout.
    Hybridization derives from incident bond orders, implicit valence/numH
    from charge-adjusted standard valences -- the RDKit path is authoritative
    for those."""
    A = ALLOWABLE_FEATURES
    n = len(mol.elements)
    G_degree = np.zeros(n, np.int32)
    aromatic = np.zeros(n, bool)
    bond_order_sum = np.zeros(n, np.float32)
    n_double = np.zeros(n, np.int32)
    n_triple = np.zeros(n, np.int32)
    # valence math runs on the Kekule orders (kept by perceive_aromaticity);
    # aromatic flags come from the perceived bond types
    kek = mol.kekule_types if mol.kekule_types is not None else mol.bond_types
    # single_nbrs: which atoms does a plain sigma bond connect me to?  Feeds
    # the conjugation-aware SP2 demotion below.
    single_nbrs: list[list[int]] = [[] for _ in range(n)]
    for (a, b), t, kt in zip(mol.bonds, mol.bond_types, kek):
        G_degree[a] += 1
        G_degree[b] += 1
        order = 1.5 if kt == 4 else kt
        bond_order_sum[a] += order
        bond_order_sum[b] += order
        if kt == 2:
            n_double[a] += 1
            n_double[b] += 1
        elif kt == 3:
            n_triple[a] += 1
            n_triple[b] += 1
        if t == 4:
            aromatic[a] = aromatic[b] = True
        if kt == 1 and t != 4:
            single_nbrs[a].append(int(b))
            single_nbrs[b].append(int(a))
    num_rings, in_ring = ring_info(n, mol.bonds)
    # per-atom atomic numbers and implicit-H counts, needed for neighbour
    # sigma-count gates in the conjugation test
    zs = np.array([atomic_number(e) for e in mol.elements], np.int32)
    num_hs = np.array(
        [
            _implicit_h_count(e, int(zs[i]), int(mol.charges[i]),
                              float(bond_order_sum[i]))
            for i, e in enumerate(mol.elements)
        ],
        np.int32,
    )

    feats = np.zeros((n, 16), np.int32)
    for i, e in enumerate(mol.elements):
        z = int(zs[i])
        num_h = int(num_hs[i])
        # hybridization from the STERIC NUMBER (sigma neighbors + lone
        # pairs), the rule RDKit applies to main-group atoms: lone pairs =
        # (valence electrons - charge - total bond order) // 2.  This gets
        # nitro N(=O)=O (SN 3 -> SP2), sulfone/sulfoxide S and phosphate P
        # (SN 4 -> SP3), nitriles/allenes (SN 2 -> SP) and amines/ethers
        # (SN 4 -> SP3) right without per-group special cases; aromatic
        # atoms report SP2 regardless (furan O is SP2 in RDKit).
        ve = _valence_electrons(z) - int(mol.charges[i])
        lone_pairs = max(0, int(ve - bond_order_sum[i] - num_h)) // 2
        sn = G_degree[i] + num_h + lone_pairs
        # conjugation-aware SP2 demotion (RDKit >= 2020.09 setHybridization):
        # an SN-4 atom with a lone pair whose p-orbital can conjugate -- a
        # lone-pair-bearing N/O/S single-bonded to an atom that itself
        # carries a double/triple/aromatic bond -- reads SP2, not SP3.
        # This is what makes amide N, aniline N, and ester/enol-ether O SP2
        # in RDKit.  Gates mirroring markConjAtomBonds/countAtomElec
        # (ConjugHybrid.cpp): the multiple-bond centre j must itself be a
        # conjugation candidate -- sigma-substitution count (degree + numH)
        # of at most 3 (sulfonyl S has 4, so sulfonamide N stays SP3) and
        # never P (Issue211: neither C(ar)-P nor P-O-C conjugate, so
        # phosphate-ester O stays SP3).  j carries a multiple bond to a
        # third atom plus the sigma bond to i, so its sigma count is >= 2;
        # the gate is therefore "2 or 3".
        conjugated = z in (7, 8, 16) and lone_pairs > 0 and any(
            (aromatic[j] or n_double[j] or n_triple[j])
            and zs[j] != 15
            and G_degree[j] + num_hs[j] <= 3
            for j in single_nbrs[i]
        )
        if aromatic[i]:
            hyb = "SP2"
        elif sn <= 2:
            hyb = "SP"
        elif sn == 3:
            hyb = "SP2"
        elif sn == 4:
            hyb = "SP2" if conjugated else "SP3"
        elif sn == 5:
            hyb = "SP3D"
        else:
            hyb = "SP3D2"
        total_degree = G_degree[i] + num_h
        feats[i] = [
            safe_index(A["possible_atomic_num_list"], z),
            0,  # chirality unspecified in the fallback
            safe_index(A["possible_degree_list"], int(total_degree)),
            safe_index(A["possible_formal_charge_list"], int(mol.charges[i])),
            safe_index(A["possible_implicit_valence_list"], int(num_h)),
            safe_index(A["possible_numH_list"], int(num_h)),
            0,  # radical electrons
            safe_index(A["possible_hybridization_list"], hyb),
            A["possible_is_aromatic_list"].index(bool(aromatic[i])),
            safe_index(A["possible_numring_list"], int(num_rings[i])),
            *(A[f"possible_is_in_ring{k}_list"].index(bool(in_ring[k][i])) for k in range(3, 9)),
        ]
    return feats


@dataclasses.dataclass
class MiniResidue:
    name: str
    chain: str
    atoms: dict  # name -> (element, xyz)


def parse_pdb_residues(path_or_text: str) -> list[MiniResidue]:
    """Parse ATOM records of a PDB file into residues (first model only)."""
    if "\n" in path_or_text:
        lines = path_or_text.splitlines()
    else:
        with open(path_or_text) as f:
            lines = f.read().splitlines()
    residues: list[MiniResidue] = []
    cur_key = None
    for L in lines:
        if L.startswith("ENDMDL"):
            break
        if not (L.startswith("ATOM") or L.startswith("HETATM")):
            continue
        resname = L[17:20].strip()
        if resname == "HOH":
            continue
        chain = L[21]
        resseq = L[22:27]
        key = (chain, resseq, resname)
        name = L[12:16].strip()
        elem = L[76:78].strip() or name[0]
        xyz = (float(L[30:38]), float(L[38:46]), float(L[46:54]))
        if key != cur_key:
            residues.append(MiniResidue(resname, chain, {}))
            cur_key = key
        residues[-1].atoms[name] = (elem, xyz)
    return residues
