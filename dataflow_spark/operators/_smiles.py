"""From-scratch SMILES canonicalization (subset).

The reference's SMILES-equivalence evaluator delegates to RDKit
(`dataflow/operators/chemistry/eval/smiles_equivalence_dataset_evaluator.py:39-62`:
``MolFromSmiles`` → ``MolToSmiles(canonical=True)`` → string compare); RDKit
is absent from this sandbox, so the engine carries its own canonicalizer
built from the published algorithm (Weininger, Weininger & Weininger,
"SMILES 2: Algorithm for Generation of Unique SMILES Notation", JCICS 1989 —
the CANGEN invariant-refinement + canonical-renumbering scheme), restricted
to a documented subset:

* atoms: organic subset (B C N O P S F Cl Br I, aromatic b c n o p s) and
  bracket atoms ``[isotope symbol Hn charge]``;
* bonds: ``- = # :`` (stereo ``/ \\`` read as single — stereochemistry is
  out of scope), branches, ring closures (``%nn`` included), ``.`` components;
* NO aromaticity perception/kekulization: ``c1ccccc1`` and ``C1=CC=CC=C1``
  are *not* identified (RDKit would) — equivalence holds up to atom order,
  ring numbering, and branch order within one aromaticity convention.

Canonical labels: refine atom invariants (element, aromatic, charge,
explicit H, isotope, degree) by iterated neighbor-multiset ranking; break
remaining ties by branching over every member of the first tied class and
taking the lexicographically smallest emitted string, which makes the result
automorphism-invariant (the standard tie-break-and-rerank loop, made exact
by exhaustive branching — fine at data-cleaning molecule sizes, guarded by
an atom cap).
"""

from __future__ import annotations

import re

_ORGANIC = ("Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I")
_AROMATIC = ("b", "c", "n", "o", "p", "s")
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, ":": 4, "/": 1, "\\": 1}
_BOND_CHAR = {2: "=", 3: "#"}
_BRACKET = re.compile(
    r"^(?P<iso>\d+)?(?P<sym>[A-Z][a-z]?|[a-z]{1,2})(?P<hyd>H\d*)?"
    r"(?P<chg>\+{1,3}|-{1,3}|\+\d+|-\d+)?$"
)

MAX_ATOMS = 120


class SmilesError(ValueError):
    pass


def parse(smiles: str):
    """Parse one component into (atoms, bonds).

    atoms: list of dicts {sym, arom, charge, h, iso}; bonds: {(i,j): order}
    with order 4 = aromatic."""
    atoms: list[dict] = []
    bonds: dict[tuple[int, int], int] = {}
    stack: list[int] = []
    ring: dict[str, tuple[int, int | None]] = {}
    prev: int | None = None
    pending: int | None = None
    i, n = 0, len(smiles)

    def add_bond(a: int, b: int, order: int | None):
        if a == b:
            raise SmilesError("self bond")
        if order is None:
            order = 4 if (atoms[a]["arom"] and atoms[b]["arom"]) else 1
        key = (min(a, b), max(a, b))
        if key in bonds:
            raise SmilesError("duplicate bond")
        bonds[key] = order

    def add_atom(d: dict) -> None:
        nonlocal prev, pending
        atoms.append(d)
        idx = len(atoms) - 1
        if prev is not None:
            add_bond(prev, idx, pending)
        prev, pending = idx, None
        if len(atoms) > MAX_ATOMS:
            raise SmilesError("molecule too large for subset canonicalizer")

    while i < n:
        ch = smiles[i]
        if ch == "[":
            j = smiles.find("]", i)
            if j < 0:
                raise SmilesError("unclosed bracket")
            m = _BRACKET.match(smiles[i + 1 : j])
            if not m:
                raise SmilesError(f"bad bracket atom {smiles[i:j+1]!r}")
            sym = m.group("sym")
            arom = sym[0].islower()
            hyd = m.group("hyd")
            h = 0 if hyd is None else (1 if hyd == "H" else int(hyd[1:]))
            chg = m.group("chg") or ""
            if chg in ("", "+", "-", "++", "--", "+++", "---"):
                charge = chg.count("+") - chg.count("-")
            else:
                charge = int(chg[1:]) * (1 if chg[0] == "+" else -1)
            add_atom(
                {"sym": sym.capitalize() if arom else sym, "arom": arom,
                 "charge": charge, "h": h, "iso": int(m.group("iso") or 0)}
            )
            i = j + 1
        elif smiles.startswith(("Cl", "Br"), i):
            add_atom({"sym": smiles[i : i + 2], "arom": False, "charge": 0, "h": None, "iso": 0})
            i += 2
        elif ch in "BCNOPSFI":
            add_atom({"sym": ch, "arom": False, "charge": 0, "h": None, "iso": 0})
            i += 1
        elif ch in _AROMATIC:
            add_atom({"sym": ch.upper(), "arom": True, "charge": 0, "h": None, "iso": 0})
            i += 1
        elif ch in _BOND_ORDER:
            pending = _BOND_ORDER[ch]
            i += 1
        elif ch == "(":
            if prev is None:
                raise SmilesError("branch before any atom")
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                raise SmilesError("unbalanced branch close")
            prev = stack.pop()
            i += 1
        elif ch.isdigit() or ch == "%":
            if prev is None:
                raise SmilesError("ring closure before any atom")
            if ch == "%":
                num = smiles[i + 1 : i + 3]
                if len(num) != 2 or not num.isdigit():
                    raise SmilesError("bad %nn ring closure")
                i += 3
            else:
                num = ch
                i += 1
            if num in ring:
                a, order0 = ring.pop(num)
                order = pending if pending is not None else order0
                add_bond(a, prev, order)
                pending = None
            else:
                ring[num] = (prev, pending)
                pending = None
        else:
            raise SmilesError(f"unsupported SMILES token {ch!r}")
    if stack:
        raise SmilesError("unbalanced branch open")
    if ring:
        raise SmilesError("unclosed ring bond")
    if not atoms:
        raise SmilesError("empty SMILES")
    return atoms, bonds


def _refine(atoms, adj, ranks):
    """Iterate neighbor-multiset refinement until the partition stabilizes."""
    n = len(atoms)
    while True:
        inv = [
            (ranks[i], tuple(sorted((o, ranks[j]) for j, o in adj[i])))
            for i in range(n)
        ]
        order = sorted(range(n), key=lambda i: inv[i])
        new = [0] * n
        r = 0
        for k, i in enumerate(order):
            if k and inv[i] != inv[order[k - 1]]:
                r += 1
            new[i] = r
        if new == ranks:
            return ranks
        ranks = new


def _emit(atoms, adj, ranks) -> str:
    """DFS from the lowest-rank atom, visiting neighbors in rank order; ring
    closures (back edges) numbered in emission order and written at both
    endpoints, bond symbol included when not implied."""
    n = len(atoms)
    start = min(range(n), key=lambda i: ranks[i])

    # DFS tree (children ordered by canonical rank); non-tree edges become
    # ring closures
    visited = [False] * n
    parent = [-1] * n
    tree_children: list[list[int]] = [[] for _ in range(n)]
    tree_edges: set[tuple[int, int]] = set()
    visited[start] = True
    stack = [(start, iter(sorted((j for j, _ in adj[start]), key=lambda j: ranks[j])))]
    while stack:
        node, it = stack[-1]
        for j in it:
            if not visited[j]:
                visited[j] = True
                parent[j] = node
                tree_children[node].append(j)
                tree_edges.add((min(node, j), max(node, j)))
                stack.append(
                    (j, iter(sorted((k for k, _ in adj[j]), key=lambda k: ranks[k])))
                )
                break
        else:
            stack.pop()

    bond_order = {}
    for i in range(n):
        for j, o in adj[i]:
            bond_order[(min(i, j), max(i, j))] = o

    closure_digit: dict[tuple[int, int], str] = {}
    next_digit = [1]

    def digit_for(key) -> str:
        if key not in closure_digit:
            d = next_digit[0]
            next_digit[0] += 1
            closure_digit[key] = str(d) if d < 10 else f"%{d:02d}"
        return closure_digit[key]

    def bond_str(i, j) -> str:
        o = bond_order[(min(i, j), max(i, j))]
        if o in _BOND_CHAR:
            return _BOND_CHAR[o]
        if o == 1 and atoms[i]["arom"] and atoms[j]["arom"]:
            return "-"  # explicit single between aromatic atoms
        return ""

    def atom_str(i) -> str:
        a = atoms[i]
        bare = (
            a["iso"] == 0 and a["charge"] == 0 and a["h"] is None
            and (a["sym"] in _ORGANIC)
        )
        sym = a["sym"].lower() if a["arom"] else a["sym"]
        if bare:
            return sym
        parts = ["["]
        if a["iso"]:
            parts.append(str(a["iso"]))
        parts.append(sym)
        h = a["h"] or 0
        if h == 1:
            parts.append("H")
        elif h > 1:
            parts.append(f"H{h}")
        c = a["charge"]
        if c:
            sign = "+" if c > 0 else "-"
            parts.append(sign if abs(c) == 1 else f"{sign}{abs(c)}")
        parts.append("]")
        return "".join(parts)

    # ring-closure partners per atom (non-tree edges)
    ring_nbrs: list[list[int]] = [[] for _ in range(n)]
    for (a, b) in bond_order:
        if (a, b) not in tree_edges:
            ring_nbrs[a].append(b)
            ring_nbrs[b].append(a)

    emitted = [False] * n
    out: list[str] = []

    def walk(i: int):
        emitted[i] = True
        out.append(atom_str(i))
        closers = [j for j in ring_nbrs[i] if emitted[j]]
        openers = [j for j in ring_nbrs[i] if not emitted[j]]
        # closers first (digits already assigned by the opener), in digit order
        for j in sorted(closers, key=lambda j: digit_for((min(i, j), max(i, j)))):
            out.append(digit_for((min(i, j), max(i, j))))
        for j in sorted(openers, key=lambda j: ranks[j]):
            out.append(bond_str(i, j) + digit_for((min(i, j), max(i, j))))
        kids = tree_children[i]
        for k, j in enumerate(kids):
            last = k == len(kids) - 1
            if not last:
                out.append("(")
            out.append(bond_str(i, j))
            walk(j)
            if not last:
                out.append(")")

    walk(start)
    return "".join(out)


def _canonical_component(atoms, bonds) -> str:
    n = len(atoms)
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for (a, b), o in bonds.items():
        adj[a].append((b, o))
        adj[b].append((a, o))
    if any(not adj[i] for i in range(n)) and n > 1:
        raise SmilesError("disconnected atoms inside one component")

    init = sorted(
        range(n),
        key=lambda i: (
            atoms[i]["sym"], atoms[i]["arom"], atoms[i]["charge"],
            -1 if atoms[i]["h"] is None else atoms[i]["h"],
            atoms[i]["iso"], len(adj[i]),
        ),
    )
    ranks = [0] * n
    r = 0

    def key_of(i):
        return (
            atoms[i]["sym"], atoms[i]["arom"], atoms[i]["charge"],
            -1 if atoms[i]["h"] is None else atoms[i]["h"],
            atoms[i]["iso"], len(adj[i]),
        )

    for k, i in enumerate(init):
        if k and key_of(i) != key_of(init[k - 1]):
            r += 1
        ranks[i] = r

    def solve(ranks) -> str:
        ranks = _refine(atoms, adj, ranks)
        n_classes = len(set(ranks))
        if n_classes == n:
            return _emit(atoms, adj, ranks)
        # first tied class (lowest rank with >1 member): branch over members
        from collections import Counter

        counts = Counter(ranks)
        tied_rank = min(rr for rr, c in counts.items() if c > 1)
        members = [i for i in range(n) if ranks[i] == tied_rank]
        best = None
        for m in members:
            nxt = [rr * 2 for rr in ranks]
            nxt[m] -= 1
            s = solve(nxt)
            if best is None or s < best:
                best = s
        return best

    return solve(ranks)


def canonical(smiles: str) -> str:
    """Canonical form of a (possibly multi-component) SMILES string.

    Raises :class:`SmilesError` on anything outside the subset."""
    if smiles is None:
        raise SmilesError("None")
    s = smiles.strip()
    if not s:
        raise SmilesError("empty")
    parts = []
    for comp in s.split("."):
        atoms, bonds = parse(comp)
        parts.append(_canonical_component(atoms, bonds))
    return ".".join(sorted(parts))


def equivalent(s1: str, s2: str) -> bool:
    """RDKit-compare analogue (smiles_equivalence_dataset_evaluator.py:39-62):
    canonicalize both sides, equal strings ⇒ same molecule; any parse failure
    ⇒ False (the reference returns False when MolFromSmiles yields None)."""
    try:
        return canonical(s1) == canonical(s2)
    except SmilesError:
        return False
