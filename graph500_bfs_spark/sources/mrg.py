"""Bit-exact Graph500 edge stream: splittable MRG RNG + exact scramble.

Reimplements, in vectorized NumPy, the *exact* pseudo-random machinery the
Graph500 reference generator is a pure function of, so that the edge table
produced here is bit-identical to the reference's for any
(scale, edgefactor, seed1, seed2):

- the L'Ecuyer k=5 multiple-recursive generator mod p = 2^31-1 with O(1)
  skip-ahead via transition-matrix powers
  (/root/reference/generator/splittable_mrg.c:17-56 documents the matrix
  algebra; we derive the same formulas from the matrix structure below),
- per-edge state = seed skipped by edge_index * 2^64
  (/root/reference/generator/graph_generator.hpp:803-804 calls
  ``mrg_skip(&st, 0, edge_index, 0)`` — the middle exponent word),
- the modulo-bias-free 4-way Bernoulli with initiator (5700, 1900)/10000
  (graph_generator.hpp:835-865; instantiation
  /root/reference/mpi/benchmark_helper.hpp:237),
- clip-and-flip quadrant descent (graph_generator.hpp:869-891),
- the exact vertex scramble: two multiply+bitreverse rounds keyed by
  scramble_val0/1 drawn from the seed stream at skip(50, 7, 0)
  (graph_generator.hpp:536-545, 625-637),
- MRG seeding from (userseed1, userseed2) (graph_generator.hpp:493-499),
- ``make_random_numbers`` for the BFS-root stream
  (graph_generator.hpp:504-520; consumed by find_roots,
  /root/reference/mpi/benchmark_helper.hpp:528-560).

End-to-end checksum: pf_nedge[scale] (/root/reference/mpi/utils.hpp:3687-3733)
— the count of generated edge slots whose endpoints are reached from a valid
root — is reproduced by ``tests/test_sources.py``; any single-bit deviation
in the RNG, descent, or scramble changes it.

Scalar bootstrap paths (seeding, scramble keys, root stream) use Python
ints; the per-edge hot path is whole-batch uint64 NumPy: a gather of 5x5
skip matrices per exponent byte followed by batched mat-vec mod p, then
`scale` Bernoulli steps — no Python per row.
"""

from __future__ import annotations

import numpy as np

MOD = (1 << 31) - 1  # 2^31 - 1
MRG_X = 107374182  # a1 coefficient, L'Ecuyer 93 table 3 (m=2^31-1, k=5)
MRG_Y = 104480  # a5 coefficient

# Graph500 defaults (/root/reference/mpi/parameters.h:93,204-205)
EDGEFACTOR = 16
USERSEED1 = 2
USERSEED2 = 3

INITIATOR_A = 5700  # graph_generator.hpp:781-786 / benchmark_helper.hpp:237
INITIATOR_BC = 1900
DENOM = 10000
REJECT_LIMIT = 0xFFFFFFFF % DENOM  # modulo-bias rejection threshold = 7295

SCRAMBLE_C0 = 0x4519840211493211  # graph_generator.hpp:630
SCRAMBLE_C1 = 0x3050852102C843A5  # graph_generator.hpp:634


# --------------------------------------------------------------------------
# Compact transition-matrix algebra (Python ints, exact).
#
# The MRG recurrence z1' = x*z1 + y*z5 (mod p) has companion matrix A whose
# powers are determined by their bottom row (s, t, u, v, w): with
#   a = x*s + t,  b = x*a + u,  c = x*b + v,  d = x*c + w   (mod p)
# the full matrix is the quasi-Toeplitz
#   A^n = [[d, s*y, a*y, b*y, c*y],
#          [c, w,   s*y, a*y, b*y],
#          [b, v,   w,   s*y, a*y],
#          [a, u,   v,   w,   s*y],
#          [s, t,   u,   v,   w  ]]
# (structure documented at splittable_mrg.c:34-56).  Multiplying two such
# matrices therefore only needs the bottom row of the product, which we read
# off column-by-column from (bottom row of m) @ (full matrix of n).
# --------------------------------------------------------------------------


def _abcd(row: tuple[int, int, int, int, int]) -> tuple[int, int, int, int]:
    s, t, u, v, w = row
    a = (MRG_X * s + t) % MOD
    b = (MRG_X * a + u) % MOD
    c = (MRG_X * b + v) % MOD
    d = (MRG_X * c + w) % MOD
    return a, b, c, d


def _full_matrix(row: tuple[int, int, int, int, int]) -> list[list[int]]:
    s, t, u, v, w = row
    a, b, c, d = _abcd(row)
    y = MRG_Y
    return [
        [d, s * y % MOD, a * y % MOD, b * y % MOD, c * y % MOD],
        [c, w, s * y % MOD, a * y % MOD, b * y % MOD],
        [b, v, w, s * y % MOD, a * y % MOD],
        [a, u, v, w, s * y % MOD],
        [s, t, u, v, w],
    ]


def _row_mul(m: tuple, n: tuple) -> tuple:
    """Bottom row of (matrix of m) @ (matrix of n)."""
    nm = _full_matrix(n)
    out = []
    for col in range(5):
        acc = 0
        for k in range(5):
            acc += m[k] * nm[k][col]
        out.append(acc % MOD)
    return tuple(out)


_ROW_IDENTITY = (0, 0, 0, 0, 1)
_ROW_A = (0, 0, 0, 1, 0)  # one MRG step


def _row_pow(exponent: int) -> tuple:
    """Bottom row of A^exponent (arbitrary-size exponent)."""
    result = _ROW_IDENTITY
    base = _ROW_A
    while exponent > 0:
        if exponent & 1:
            result = _row_mul(result, base)
        base = _row_mul(base, base)
        exponent >>= 1
    return result


def make_mrg_seed(seed1: int, seed2: int) -> tuple[int, int, int, int, int]:
    """(z1..z5) from user seeds — graph_generator.hpp:493-499."""
    return (
        (seed1 & 0x3FFFFFFF) + 1,
        ((seed1 >> 30) & 0x3FFFFFFF) + 1,
        (seed2 & 0x3FFFFFFF) + 1,
        ((seed2 >> 30) & 0x3FFFFFFF) + 1,
        ((seed2 >> 60) << 4) + (seed1 >> 60) + 1,
    )


def _apply_row(row: tuple, z: tuple) -> tuple:
    mat = _full_matrix(row)
    return tuple(sum(mat[r][c] * z[c] for c in range(5)) % MOD for r in range(5))


def mrg_skip(z: tuple, exponent: int) -> tuple:
    """State advanced by `exponent` steps (scalar, exact)."""
    return _apply_row(_row_pow(exponent), z)


def mrg_next(z: tuple) -> tuple[int, tuple]:
    """One original MRG step; returns (uint draw, new state)."""
    new = (MRG_X * z[0] + MRG_Y * z[4]) % MOD
    return new, (new, z[0], z[1], z[2], z[3])


def make_random_numbers(nvalues: int, seed1: int, seed2: int, position: int) -> list[float]:
    """Root-stream doubles — graph_generator.hpp:504-520: seed, skip by
    2*2^128 + 2*position, then each double folds two uint draws."""
    z = make_mrg_seed(seed1, seed2)
    z = mrg_skip(z, (2 << 128) + 2 * position)
    out = []
    inv1 = 0.000000000465661287524579692  # (2^31-1)^-1, splittable_mrg.c:338
    inv2 = 0.0000000000000000002168404346990492787  # (2^31-1)^-2
    for _ in range(nvalues):
        u1, z = mrg_next(z)
        u2, z = mrg_next(z)
        out.append(u1 * inv1 + u2 * inv2)
    return out


def scramble_vals(seed1: int, seed2: int) -> tuple[int, int]:
    """(scramble_val0, scramble_val1) — graph_generator.hpp:536-545:
    seed state skipped by 50*2^128 + 7*2^64, then 4 uint draws."""
    z = make_mrg_seed(seed1, seed2)
    z = mrg_skip(z, (50 << 128) + (7 << 64))
    a, z = mrg_next(z)
    b, z = mrg_next(z)
    c, z = mrg_next(z)
    d, z = mrg_next(z)
    val0 = (a * 0xFFFFFFFF + b) & 0xFFFFFFFFFFFFFFFF
    val1 = (c * 0xFFFFFFFF + d) & 0xFFFFFFFFFFFFFFFF
    return val0, val1


# --------------------------------------------------------------------------
# Vectorized batch engine.
# --------------------------------------------------------------------------

_P64 = np.uint64(MOD)
_SKIP_TABLE: np.ndarray | None = None  # (24, 256, 5, 5) uint64: A^(val*256^i)


def _skip_table() -> np.ndarray:
    """A^(val * 256^byte) for byte 0..23, val 0..255 — the same table the
    reference precomputes into mrg_transitions.c (dump_mrg_powers,
    splittable_mrg.c:258-320), rebuilt here from the matrix algebra."""
    global _SKIP_TABLE
    if _SKIP_TABLE is None:
        tab = np.empty((24, 256, 5, 5), dtype=np.uint64)
        base = _ROW_A  # A^(256^0)
        for i in range(24):
            row = _ROW_IDENTITY
            for val in range(256):
                tab[i, val] = _full_matrix(row)
                row = _row_mul(row, base)
            # base <- base^256 by 8 squarings
            for _ in range(8):
                base = _row_mul(base, base)
        _SKIP_TABLE = tab
    return _SKIP_TABLE


def _fold(t: np.ndarray) -> np.ndarray:
    """Partial reduction mod 2^31-1: result < 2^32 for t < 2^62."""
    return (t & _P64) + (t >> np.uint64(31))


def _modp(t: np.ndarray) -> np.ndarray:
    """Full reduction to [0, p) for t < 2^62."""
    t = _fold(_fold(t))
    return np.where(t >= _P64, t - _P64, t)


def _matvec_batch(mats: np.ndarray, Z: np.ndarray) -> np.ndarray:
    """(B,5,5) gathered matrices x (5,B) states -> (5,B), all mod p."""
    out = np.empty_like(Z)
    for r in range(5):
        acc = _fold(mats[:, r, 0] * Z[0])
        for c in range(1, 5):
            acc += _fold(mats[:, r, c] * Z[c])  # each term < 2^32; sum < 2^35
        out[r] = _modp(acc)
    return out


def mrg_state_batch(edge_idx: np.ndarray, seed1: int, seed2: int) -> np.ndarray:
    """(5, B) per-edge MRG states: seed skipped by edge_index * 2^64
    (graph_generator.hpp:803-804).  Exponent bytes 8..15 hold edge_index's
    bytes 0..7; zero bytes hit the table's identity entry (no masking)."""
    tab = _skip_table()
    idx = edge_idx.astype(np.uint64)
    z0 = make_mrg_seed(seed1, seed2)
    Z = np.tile(np.array(z0, dtype=np.uint64)[:, None], (1, len(idx)))
    for b in range(8):
        vals = ((idx >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.intp)
        if not vals.any():
            continue
        Z = _matvec_batch(tab[8 + b][vals], Z)
    return Z


def _step_batch(Z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One original MRG step on every lane: (val, new Z)."""
    new = _modp(np.uint64(MRG_X) * Z[0] + np.uint64(MRG_Y) * Z[4])
    return new, np.stack([new, Z[0], Z[1], Z[2], Z[3]])


def _bernoulli_batch(Z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Modulo-bias-free quadrant draw (graph_generator.hpp:835-865):
    redraw lanes with val < 0xFFFFFFFF % 10000, then map
    [0,1900)->1, [1900,3800)->2, [3800,9500)->0, [9500,10000)->3."""
    val, Z = _step_batch(Z)
    bad = val < np.uint64(REJECT_LIMIT)
    while bad.any():
        sel = np.flatnonzero(bad)
        v2, sub = _step_batch(Z[:, sel])
        Z[:, sel] = sub
        val[sel] = v2
        bad[sel] = v2 < np.uint64(REJECT_LIMIT)
    m = val % np.uint64(DENOM)
    sq = np.where(
        m < np.uint64(INITIATOR_BC),
        np.uint64(1),
        np.where(
            m < np.uint64(2 * INITIATOR_BC),
            np.uint64(2),
            np.where(m < np.uint64(2 * INITIATOR_BC + INITIATOR_A), np.uint64(0), np.uint64(3)),
        ),
    )
    return sq, Z


def bitreverse64(x: np.ndarray) -> np.ndarray:
    """Full 64-bit reverse (graph_generator.hpp:569-620)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> np.uint64(1)) & m1) | ((x & m1) << np.uint64(1))
    x = ((x >> np.uint64(2)) & m2) | ((x & m2) << np.uint64(2))
    x = ((x >> np.uint64(4)) & m4) | ((x & m4) << np.uint64(4))
    return x.byteswap()


def scramble_exact(
    v: np.ndarray, scale: int, val0: int, val1: int
) -> np.ndarray:
    """The reference vertex permutation (graph_generator.hpp:625-637)."""
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        x = v.astype(np.uint64)
        x = x + np.uint64(val0) + np.uint64(val1)
        x = x * np.uint64(val0 | SCRAMBLE_C0)
        x = bitreverse64(x) >> np.uint64(64 - scale)
        x = x * np.uint64(val1 | SCRAMBLE_C1)
        x = bitreverse64(x) >> np.uint64(64 - scale)
    return x.astype(np.int64)


_CHUNK = 32768  # keep the working set (state + gathered matrices) L2-resident


def graph500_edge_batch(
    edge_idx: np.ndarray, scale: int, seed1: int = USERSEED1, seed2: int = USERSEED2
) -> tuple[np.ndarray, np.ndarray]:
    """Bit-exact (scramble(u), scramble(v)) for a batch of edge indices.
    Chunks internally: a 1M-lane batch is ~2.8x slower than 32k-lane chunks
    because the (B,5,5) matrix gather and per-level temporaries fall out of
    cache."""
    if len(edge_idx) > _CHUNK:
        parts = [
            _edge_chunk(edge_idx[lo : lo + _CHUNK], scale, seed1, seed2)
            for lo in range(0, len(edge_idx), _CHUNK)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    return _edge_chunk(edge_idx, scale, seed1, seed2)


def _edge_chunk(
    edge_idx: np.ndarray, scale: int, seed1: int = USERSEED1, seed2: int = USERSEED2
) -> tuple[np.ndarray, np.ndarray]:
    """One chunk of make_one_edge's quadrant descent with clip-and-flip
    (graph_generator.hpp:869-891), whole-batch vectorized.

    The MRG state lives in a (5, B) circular buffer stepped IN PLACE: each
    step overwrites the row holding z5 with the new z1 and rotates the top
    pointer, so the per-level cost is one fused modp expression, not a
    5-row copy."""
    Z = mrg_state_batch(edge_idx, seed1, seed2)
    n = len(edge_idx)
    top = 0
    cx, cy = np.uint64(MRG_X), np.uint64(MRG_Y)
    rej = np.uint64(REJECT_LIMIT)

    def step_all() -> np.ndarray:
        nonlocal top
        p = (top + 4) % 5
        new = _modp(cx * Z[top] + cy * Z[p])
        Z[p] = new
        top = p
        return new

    base_src = np.zeros(n, dtype=np.uint64)
    base_tgt = np.zeros(n, dtype=np.uint64)
    nverts = np.uint64(1 << scale)
    one = np.uint64(1)
    while nverts > 1:
        val = step_all()
        bad = val < rej
        while bad.any():  # P ~ 3.4e-6 per lane: almost never taken
            sel = np.flatnonzero(bad)
            p = (top + 4) % 5
            v2 = _modp(cx * Z[top][sel] + cy * Z[p][sel])
            # rotate ONLY the redrawn lanes: their z5 row is consumed
            for r in range(4, 0, -1):
                Z[(top + r) % 5][sel] = Z[(top + r - 1) % 5][sel]
            Z[top][sel] = v2
            val[sel] = v2
            bad[sel] = v2 < rej
        m = val % np.uint64(DENOM)
        sq = np.where(
            m < np.uint64(INITIATOR_BC),
            np.uint64(1),
            np.where(
                m < np.uint64(2 * INITIATOR_BC),
                np.uint64(2),
                np.where(
                    m < np.uint64(2 * INITIATOR_BC + INITIATOR_A), np.uint64(0), np.uint64(3)
                ),
            ),
        )
        so = sq >> one
        to = sq & one
        # clip-and-flip keeps base_src <= base_tgt on the diagonal
        swap = (base_src == base_tgt) & (so > to)
        so, to = np.where(swap, to, so), np.where(swap, so, to)
        nverts >>= one
        base_src += nverts * so
        base_tgt += nverts * to
    val0, val1 = scramble_vals(seed1, seed2)
    return (
        scramble_exact(base_src, scale, val0, val1),
        scramble_exact(base_tgt, scale, val0, val1),
    )


def find_roots_exact(
    scale: int,
    n_roots: int,
    has_edge: "callable[[int], bool]",
    r1: int = 0,
    r2: int = 0,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
) -> list[int]:
    """The reference root-sampling protocol
    (/root/reference/mpi/benchmark_helper.hpp:528-560): a deterministic
    double stream at seeds (seed1+r1, seed2+r2), candidate
    (d0+d1)*n mod n, dedup, keep if the vertex has an edge."""
    n = 1 << scale
    roots: list[int] = []
    counter = 0
    while len(roots) < n_roots:
        d = make_random_numbers(2, seed1 + r1, seed2 + r2, counter)
        root = int((d[0] + d[1]) * n) % n
        counter += 2
        if counter > 2 * n:
            # protocol degeneracy (near-edgeless graph): fail loudly instead
            # of returning a short list that callers index unconditionally
            raise ValueError(
                f"root-sampling stream exhausted after {counter} draws: found "
                f"{len(roots)}/{n_roots} roots with edges at scale {scale} — "
                "the graph is too sparse for the Graph500 root protocol"
            )
        if root in roots:
            continue
        if has_edge(root):
            roots.append(root)
    return roots


def uniform_edge_batch(
    edge_idx: np.ndarray, scale: int, seed1: int = USERSEED1, seed2: int = USERSEED2
) -> tuple[np.ndarray, np.ndarray]:
    """S6 — the reference's test-only uniform (Erdős–Rényi-style) generator,
    bit-exact: per-edge state = seed skipped by edge_index*2^64, then two
    uint draws masked to [0, 2^scale), both scrambled
    (/root/reference/generator/graph_generator.hpp:744-779)."""
    Z = mrg_state_batch(edge_idx, seed1, seed2)
    mask = np.uint64((1 << scale) - 1)
    u1, Z = _step_batch(Z)
    u2, Z = _step_batch(Z)
    val0, val1 = scramble_vals(seed1, seed2)
    return (
        scramble_exact(u1 & mask, scale, val0, val1),
        scramble_exact(u2 & mask, scale, val0, val1),
    )


def weight_batch(
    edge_idx: np.ndarray,
    max_weight: int,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
) -> np.ndarray:
    """Bit-exact per-edge weight stream — the vectorized form of the
    reference's generateWeight (graph_generator.hpp:647-679, the real
    non-debug branch): per-edge state = seed skipped by
    30·2^128 + 46·2^64 + edge_index, one original-MRG uint draw,
    ``% max_weight + 1`` → integer weights in [1, max_weight].

    The constant 30/46 part is ONE scalar skip applied to the seed; the
    per-edge part indexes the low 8 bytes of the same precomputed
    transition table the edge stream uses (O(1) skip-ahead, so any edge's
    weight is computable on any partition independently).
    """
    tab = _skip_table()
    idx = edge_idx.astype(np.uint64)
    z0 = mrg_skip(make_mrg_seed(seed1, seed2), (30 << 128) + (46 << 64))
    Z = np.tile(np.array(z0, dtype=np.uint64)[:, None], (1, len(idx)))
    for b in range(8):
        vals = ((idx >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.intp)
        if not vals.any():
            continue
        Z = _matvec_batch(tab[b][vals], Z)
    val, _ = _step_batch(Z)
    return (val % np.uint64(max_weight)).astype(np.int64) + 1
