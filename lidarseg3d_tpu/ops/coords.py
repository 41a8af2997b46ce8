"""Voxel-coordinate hashing and hash-table lookups (pure JAX, static shapes).

This is the TPU-native replacement for spconv's rulebook machinery
(cf. /root/reference/det3d/models/backbones/scn_unet.py:11-30 and SURVEY.md
§2.4): active voxel coordinates are linearized to int32 keys, sorted once per
voxel set, and neighbor lookups are binary searches (``searchsorted``) over
the sorted key table. All shapes are static; invalid slots carry sentinel
keys that can never match.

Layout convention: per-sample capacity padding, i.e. coords are [B, V, 3]
int32 in (z, y, x) order with invalid rows = -1, and valid rows forming a
prefix of length num_voxels[b].
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

INVALID_KEY = np.int32(2**31 - 1)  # sorts to the end; never a valid key
INVALID_QUERY = np.int32(-1)  # below every valid key; never matches


def check_shape_fits_int32(spatial_shape):
    total = int(np.prod([int(s) for s in spatial_shape]))
    if total >= 2**31 - 1:
        raise ValueError(
            f"spatial_shape {spatial_shape} has {total} cells; linear int32 "
            "keys would overflow. Use a coarser grid or tighter range."
        )


def linearize(coords, spatial_shape):
    """coords [..., 3] int32 (z, y, x) -> linear key [...] int32.

    Out-of-bounds or invalid coords are NOT checked here; see make_query_keys.
    """
    Z, Y, X = (int(s) for s in spatial_shape)
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    return (z * Y + y) * X + x


def delinearize(keys, spatial_shape):
    """linear keys [...] -> coords [..., 3] (z, y, x); invalid keys -> -1."""
    Z, Y, X = (int(s) for s in spatial_shape)
    invalid = keys == INVALID_KEY
    z = keys // (Y * X)
    rem = keys % (Y * X)
    y = rem // X
    x = rem % X
    coords = jnp.stack([z, y, x], axis=-1)
    return jnp.where(invalid[..., None], -1, coords)


def make_table_keys(coords, valid_mask, spatial_shape):
    """Keys for the lookup table: valid voxels -> linear key, else INVALID_KEY."""
    keys = linearize(coords, spatial_shape)
    return jnp.where(valid_mask, keys, INVALID_KEY).astype(jnp.int32)


def make_query_keys(coords, spatial_shape, extra_valid=None):
    """Keys for queries: in-bounds coords -> linear key, else INVALID_QUERY."""
    Z, Y, X = (int(s) for s in spatial_shape)
    bounds = jnp.array([Z, Y, X], dtype=coords.dtype)
    inb = jnp.all((coords >= 0) & (coords < bounds), axis=-1)
    if extra_valid is not None:
        inb = inb & extra_valid
    keys = linearize(coords, spatial_shape)
    return jnp.where(inb, keys, INVALID_QUERY).astype(jnp.int32)


def build_dense_table(coords, num_voxels, spatial_shape):
    """Direct-address lookup table: table[b, key] = row index, -1 = empty.

    This is the TPU-native rulebook structure: a neighbor lookup becomes ONE
    vector gather instead of a binary search (searchsorted costs ~20ms per
    160k queries on v5e vs ~2ms for the same queries as a dense-table
    gather; the table build is a single ~2ms scatter). Memory is
    prod(spatial_shape) * 4 bytes per sample, transient within the rulebook
    build.
    """
    B, V, _ = coords.shape
    ncells = int(np.prod([int(s) for s in spatial_shape]))
    valid = jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
    keys = linearize(coords, spatial_shape)
    # route invalid rows to a scratch cell one past the end
    keys = jnp.where(valid, keys, ncells).astype(jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (B, V))

    def one(k, r):
        t = jnp.full((ncells + 1,), -1, dtype=jnp.int32)
        return t.at[k].set(r, mode="drop")[:ncells]

    return jax.vmap(one)(keys, rows)


def lookup_dense(table, qkeys):
    """Batched dense-table lookup.

    table: [B, NC] int32; qkeys: [B, Q] (INVALID_QUERY = -1 for no-op).
    Returns (idx [B, Q] int32 with misses undefined, found [B, Q] bool).
    """
    B, NC = table.shape
    flat = table.reshape(B * NC)
    offs = (jnp.arange(B, dtype=jnp.int32) * NC)[:, None]
    gq = jnp.clip(qkeys, 0, NC - 1) + offs
    idx = jnp.take(flat, gq.reshape(-1), axis=0).reshape(qkeys.shape)
    found = (qkeys >= 0) & (idx >= 0)
    return idx, found


class RankTable(struct.PyTreeNode):
    """Direct-address table of PACKED cumulative ranks + activity bits.

    cell value = (rank << 3) | act(cell-1) << 2 | act(cell) << 1 | act(cell+1)
    where rank = number of active cells <= cell (per sample) and ``cell``
    indexes an X-EXTENDED grid (x in [-1, X], i.e. row width X+2) so the
    left/right activity bits never alias a neighboring y-row and boundary
    taps need no masks (the guard cells are never active).

    Because voxel rows are KEY-SORTED, rank(cell)-1 IS the row index of an
    active cell, and rank of the x+-1 cells follows from the activity bits:
        row(x)   = rank - 1                 if act(x)
        row(x-1) = rank - act(x) - 1        if act(x-1)
        row(x+1) = rank + act(x+1) - 1      if act(x+1)
    so the three x-taps of a 3^3 kernel group cost ONE element gather
    instead of three - element gathers move a full 512 B line per element on
    TPU, so this cuts the rulebook-build HBM traffic 3x (the round-2 perf
    wall after the fused conv kernel: 124 ms of a 164 ms forward).
    """

    packed: jnp.ndarray  # [B, Z*Y*(X+2)] int32
    spatial_shape: tuple = struct.field(pytree_node=False)  # original (Z,Y,X)

    @property
    def row_width(self):
        return int(self.spatial_shape[2]) + 2


def _ext_cell(coords_zyx_xext, spatial_shape):
    """(z, y, x_ext) -> extended flat cell; x_ext in [0, X+2)."""
    Z, Y, X = (int(s) for s in spatial_shape)
    z, y, xe = (coords_zyx_xext[..., 0], coords_zyx_xext[..., 1],
                coords_zyx_xext[..., 2])
    return (z * Y + y) * (X + 2) + xe


# Tables at least this many cells build via the one-pass Pallas pack
# kernel on TPU (ops/pallas_rank.py); smaller ones aren't worth the call
# overhead. Measured: the XLA formulation costs 12.0 ms on the 172 MB
# nuScenes stage-1 table (~6 passes), the kernel streams it once.
PACK_PALLAS_MIN_CELLS = 1 << 20


def _pack_use_pallas(nce):
    import jax as _jax

    return (nce >= PACK_PALLAS_MIN_CELLS
            and _jax.default_backend() == "tpu")


def build_rank_table(coords, num_voxels, spatial_shape, use_pallas=None):
    """Build the packed rank/activity table (see RankTable)."""
    from . import pallas_rank

    B, V, _ = coords.shape
    Z, Y, X = (int(s) for s in spatial_shape)
    nce = Z * Y * (X + 2)
    valid = jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    cell = (z * Y + y) * (X + 2) + (x + 1)
    cell = jnp.where(valid, cell, nce).astype(jnp.int32)
    if use_pallas is None:
        use_pallas = _pack_use_pallas(nce)

    def one(cell):
        if use_pallas:
            act = jnp.zeros((nce + 1,), jnp.int8).at[cell].set(1, mode="drop")
            return pallas_rank.pack_rank_table(act[:nce])
        act = jnp.zeros((nce + 1,), jnp.int32).at[cell].set(1, mode="drop")
        act = act[:nce]
        # blocked prefix sum: one pass for block sums + cheap block cumsum +
        # one fused output pass (jnp.cumsum over ~100M cells is log-pass)
        BLK = 512
        pad = -nce % BLK
        a2 = jnp.pad(act, (0, pad)).reshape(-1, BLK)
        block_tot = a2.sum(axis=1)
        block_off = jnp.cumsum(block_tot) - block_tot
        rank = (jnp.cumsum(a2, axis=1) + block_off[:, None]).reshape(-1)[:nce]
        am = jnp.concatenate([jnp.zeros((1,), jnp.int32), act[:-1]])
        ap = jnp.concatenate([act[1:], jnp.zeros((1,), jnp.int32)])
        return (rank << 3) | (am << 2) | (act << 1) | ap

    return RankTable(packed=jax.vmap(one)(cell),
                     spatial_shape=(Z, Y, X))


def _rank_bits(v):
    return v >> 3, (v >> 2) & 1, (v >> 1) & 1, v & 1  # rank, am, a0, ap


class KeyTable(struct.PyTreeNode):
    """Sorted-keys lookup 'table': no dense per-cell storage at all.

    For grids whose dense RankTable exceeds the lookup kernel's VMEM budget
    (real 0.1 m nuScenes stage 1-2: 172 / 22 MB; real 0.05 m SemanticKITTI
    stage 1: ~2 GB), the rulebook queries are answered straight from the
    sorted voxel KEY array (V int32, VMEM-resident at every capacity in
    this framework) by the Pallas merge kernel (ops/pallas_merge.py), with
    a coarse block-rank array supplying per-query-tile anchors. Lookups
    return the same packed (rank, am, a0, ap) values as a RankTable gather;
    build cost is O(V) (no dense scatter, no pack pass).

    keys are linearized on the x-EXTENDED grid ((z*Y + y)*(X+2) + x+1, same
    cell space as RankTable) and REQUIRE key-sorted voxel rows, like
    RankTable (rank-1 == row index).
    """

    keys: jnp.ndarray  # [B, Vp] int32 ascending; INVALID_KEY padding
    coarse: jnp.ndarray  # [B, NB+1] int32: #{keys < b << shift}
    num: jnp.ndarray  # [B] int32 valid counts
    spatial_shape: tuple = struct.field(pytree_node=False)  # (Z, Y, X)
    shift: int = struct.field(pytree_node=False, default=12)


def build_key_table(coords, num_voxels, spatial_shape, shift=12):
    """Build a KeyTable (see above). O(V + ncells >> shift)."""
    from . import pallas_merge

    B, V, _ = coords.shape
    Z, Y, X = (int(s) for s in spatial_shape)
    nce = Z * Y * (X + 2)
    valid = jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    cell = (z * Y + y) * (X + 2) + (x + 1)
    keys = jnp.where(valid, cell, INVALID_KEY).astype(jnp.int32)
    vp = -(-V // pallas_merge.WIN) * pallas_merge.WIN
    if vp != V:
        keys = jnp.pad(keys, ((0, 0), (0, vp - V)),
                       constant_values=INVALID_KEY)
    nb = (nce >> shift) + 2
    blk = jnp.where(valid, cell >> shift, nb).astype(jnp.int32)

    def one(blk):
        hist = jnp.zeros((nb + 1,), jnp.int32).at[blk].add(1, mode="drop")
        return jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist[:nb])]
        )

    return KeyTable(
        keys=keys,
        coarse=jax.vmap(one)(blk),
        num=num_voxels.astype(jnp.int32),
        spatial_shape=(Z, Y, X),
        shift=shift,
    )


def lookup_key(table: KeyTable, qcoords, extra_valid=None):
    """Single-cell lookup on a KeyTable, same contract as lookup_rank.

    searchsorted-based (log V element gathers per query); only the
    non-3-wide-kernel builder paths use this — the hot 3^3 rulebooks go
    through the grouped merge-kernel path in sparse.py.
    """
    Z, Y, X = (int(s) for s in table.spatial_shape)
    bounds = jnp.asarray([Z, Y, X], dtype=qcoords.dtype)
    inb = jnp.all((qcoords >= 0) & (qcoords < bounds), axis=-1)
    if extra_valid is not None:
        inb = inb & extra_valid
    cell = ((qcoords[..., 0] * Y + qcoords[..., 1]) * (X + 2)
            + qcoords[..., 2] + 1).astype(jnp.int32)

    def one(keys, num, c):
        pos = jnp.searchsorted(keys, c, side="left")
        posc = jnp.clip(pos, 0, keys.shape[0] - 1)
        found = (jnp.take(keys, posc, axis=0) == c) & (pos < num)
        return posc.astype(jnp.int32), found

    idx, found = jax.vmap(one)(table.keys, table.num, cell)
    return idx, found & inb


def lookup_rank(table: RankTable, qcoords, extra_valid=None):
    """Single-cell lookup on a RankTable, same contract as lookup_dense.

    qcoords: [B, Q, 3] int32 (z, y, x). Returns (idx, found)."""
    Z, Y, X = (int(s) for s in table.spatial_shape)
    B = qcoords.shape[0]
    nce = Z * Y * (X + 2)
    bounds = jnp.asarray([Z, Y, X], dtype=qcoords.dtype)
    inb = jnp.all((qcoords >= 0) & (qcoords < bounds), axis=-1)
    if extra_valid is not None:
        inb = inb & extra_valid
    xe = qcoords[..., 2] + 1
    cell = _ext_cell(
        jnp.stack([qcoords[..., 0], qcoords[..., 1], xe], -1),
        table.spatial_shape,
    )
    cell = jnp.clip(cell, 0, nce - 1)
    flat = table.packed.reshape(B * nce)
    offs = (jnp.arange(B, dtype=jnp.int32) * nce)[:, None]
    v = jnp.take(flat, (cell + offs).reshape(-1), axis=0).reshape(cell.shape)
    rank, _, a0, _ = _rank_bits(v)
    found = inb & (a0 > 0)
    return (rank - 1).astype(jnp.int32), found


def lookup_rank3(table: RankTable, center_coords, center_valid):
    """Grouped lookup: ONE gather yields the rows of cells x-1, x, x+1.

    center_coords: [B, Q, 3] (z, y, x) with x in [-1, X] (extended range;
    z/y must be masked via center_valid when out of bounds).
    Returns ((idx_m, f_m), (idx_0, f_0), (idx_p, f_p)).
    """
    Z, Y, X = (int(s) for s in table.spatial_shape)
    B = center_coords.shape[0]
    nce = Z * Y * (X + 2)
    z, y, x = (center_coords[..., 0], center_coords[..., 1],
               center_coords[..., 2])
    inb = ((z >= 0) & (z < Z) & (y >= 0) & (y < Y)
           & (x >= -1) & (x <= X) & center_valid)
    cell = (z * Y + y) * (X + 2) + (x + 1)
    cell = jnp.clip(cell, 0, nce - 1)
    flat = table.packed.reshape(B * nce)
    offs = (jnp.arange(B, dtype=jnp.int32) * nce)[:, None]
    v = jnp.take(flat, (cell + offs).reshape(-1), axis=0).reshape(cell.shape)
    rank, am, a0, ap = _rank_bits(v)
    idx_0 = rank - 1
    idx_m = rank - a0 - 1
    idx_p = rank + ap - 1
    f = lambda a: inb & (a > 0)
    i32 = lambda a: a.astype(jnp.int32)
    return ((i32(idx_m), f(am)), (i32(idx_0), f(a0)), (i32(idx_p), f(ap)))


def lookup_coords(table, qcoords, spatial_shape, extra_valid=None):
    """Coordinate-level lookup dispatching on table kind."""
    if isinstance(table, KeyTable):
        return lookup_key(table, qcoords, extra_valid)
    if isinstance(table, RankTable):
        return lookup_rank(table, qcoords, extra_valid)
    qkeys = make_query_keys(qcoords, spatial_shape, extra_valid=extra_valid)
    return lookup_any(table, qkeys)


class HashMap(struct.PyTreeNode):
    """Open-addressing (linear probing) voxel hash map.

    Replaces the direct-address dense table for rulebook builds: memory is
    O(slots) per sample (e.g. 2 MB at 2^19 slots) instead of
    prod(spatial_shape)*4 B (371 MB on the SemanticKITTI grid), which frees
    HBM for batched training and keeps lookups cache-friendly. This is the
    TPU equivalent of spconv's GPU hash rulebook builder.
    """

    hkeys: jnp.ndarray  # [B, S] int32 linear keys; INVALID_KEY = empty
    hvals: jnp.ndarray  # [B, S] int32 row indices

    @property
    def slots(self):
        return self.hkeys.shape[-1]


def _fib_hash(keys, slots):
    """Fibonacci multiplicative hash onto [0, slots) (slots power of 2)."""
    h = (keys.astype(jnp.uint32) * np.uint32(2654435761)) >> np.uint32(
        32 - int(np.log2(slots))
    )
    return h.astype(jnp.int32)


def default_slots(capacity):
    """Power-of-two slot count at load factor <= 1/16.

    Lookup cost on TPU is (max probe-chain length) rounds of full-query
    element gathers (~2.1 ns/element each), so short chains matter far more
    than table bytes: 16x slots is ~8 MB at SemanticKITTI capacity and keeps
    worst-case chains to a handful of rounds."""
    return max(1024, 1 << int(np.ceil(np.log2(max(16 * capacity, 2)))))


def build_hash_map(coords, num_voxels, spatial_shape, slots=None):
    """Insert all valid voxel keys; returns a HashMap.

    Insertion is round-synchronous linear probing: each round, unplaced keys
    scatter into their probe slot if it was empty at round start (occupied
    slots are never re-targeted, so placements are final); winners are
    detected by gather-back, losers advance their probe. Terminates because
    every round places at least one contender.
    """
    B, V, _ = coords.shape
    if slots is None:
        slots = default_slots(V)
    valid = jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
    keys = make_table_keys(coords, valid, spatial_shape)  # INVALID_KEY pads
    h0 = _fib_hash(keys, slots)
    rows = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (B, V))
    mask = slots - 1

    def one(keys, h0, rows, valid):
        hkeys = jnp.full((slots,), INVALID_KEY, jnp.int32)
        hvals = jnp.full((slots,), -1, jnp.int32)
        placed = ~valid
        probe = jnp.zeros((V,), jnp.int32)

        def cond(st):
            return ~jnp.all(st[2])

        def body(st):
            hkeys, hvals, placed, probe = st
            c = (h0 + probe) & mask
            empty = hkeys[c] == INVALID_KEY
            tgt = jnp.where((~placed) & empty, c, slots)
            hkeys2 = hkeys.at[tgt].set(keys, mode="drop")
            won = (~placed) & (hkeys2[c] == keys)
            hvals2 = hvals.at[jnp.where(won, c, slots)].set(rows, mode="drop")
            placed2 = placed | won
            return hkeys2, hvals2, placed2, probe + 1 - won.astype(jnp.int32)

        hkeys, hvals, _, _ = jax.lax.while_loop(
            cond, body, (hkeys, hvals, placed, probe)
        )
        return hkeys, hvals

    hkeys, hvals = jax.vmap(one)(keys, h0, rows, valid)
    return HashMap(hkeys=hkeys, hvals=hvals)


def lookup_hash(table: HashMap, qkeys):
    """Batched hash lookup, same contract as lookup_dense.

    qkeys: [B, Q] int32 (INVALID_QUERY = -1 for no-op queries).
    Returns (idx [B, Q] int32 with misses undefined, found [B, Q] bool).
    All queries probe in lockstep rounds until each hits its key or an
    empty slot (linear probing invariant: a key's probe chain has no gaps).
    """
    slots = table.slots
    mask = slots - 1
    h0 = _fib_hash(qkeys, slots)

    def one(hkeys, hvals, qkeys, h0):
        Q = qkeys.shape[0]
        resolved = qkeys == INVALID_QUERY
        slot = jnp.zeros((Q,), jnp.int32)  # hit slot (value gathered ONCE
        # after the loop - halves the per-round gather traffic)
        hit_any = jnp.zeros((Q,), bool)
        probe = jnp.zeros((Q,), jnp.int32)

        def cond(st):
            return ~jnp.all(st[1])

        def body(st):
            slot, resolved, hit_any, probe = st
            c = (h0 + probe) & mask
            k = hkeys[c]
            hit = (~resolved) & (k == qkeys)
            done = hit | (k == INVALID_KEY)
            slot = jnp.where(hit, c, slot)
            return slot, resolved | done, hit_any | hit, probe + 1

        slot, _, hit_any, _ = jax.lax.while_loop(
            cond, body, (slot, resolved, hit_any, probe)
        )
        return jnp.where(hit_any, hvals[slot], -1)

    idx = jax.vmap(one)(table.hkeys, table.hvals, qkeys, h0)
    found = (qkeys >= 0) & (idx >= 0)
    return idx, found


def lookup_any(table, qkeys):
    """Dispatch on table kind: HashMap or dense direct-address array."""
    if isinstance(table, HashMap):
        return lookup_hash(table, qkeys)
    return lookup_dense(table, qkeys)


def build_hash_table(coords, num_voxels, spatial_shape):
    """Sort the voxel keys once; returns (sorted_keys [B,V], perm [B,V]).

    perm maps sorted position -> original row index.
    """
    B, V, _ = coords.shape
    valid = jnp.arange(V, dtype=jnp.int32)[None, :] < num_voxels[:, None]
    keys = make_table_keys(coords, valid, spatial_shape)
    perm = jnp.argsort(keys, axis=-1)
    sorted_keys = jnp.take_along_axis(keys, perm, axis=-1)
    return sorted_keys, perm.astype(jnp.int32)


def _lookup_1d(sorted_keys, perm, qkeys, pad_index):
    pos = jnp.searchsorted(sorted_keys, qkeys)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    found = (sorted_keys[pos] == qkeys) & (qkeys != INVALID_QUERY)
    idx = jnp.where(found, perm[pos], pad_index)
    return idx.astype(jnp.int32), found


def lookup(sorted_keys, perm, qkeys, pad_index=None):
    """Batched hash lookup.

    sorted_keys, perm: [B, V]; qkeys: [B, Q] (INVALID_QUERY for no-op queries).
    Returns (idx [B, Q] int32, found [B, Q] bool). Misses map to ``pad_index``
    (default V, i.e. one-past-the-end — pair with a zero padding row).
    """
    V = sorted_keys.shape[-1]
    if pad_index is None:
        pad_index = V
    return jax.vmap(lambda sk, p, q: _lookup_1d(sk, p, q, pad_index))(
        sorted_keys, perm, qkeys
    )


# Dense (sort-free) dedup pays one ncells-element scatter, so it only wins
# when the grid is in the same ballpark as the candidate count; beyond
# UNIQUE_DENSE_RATIO * V the sort path is cheaper (measured on v5e at the
# nuScenes 0.1 m grid: dense dedup onto the 5.5 M-cell stage-2 grid cost
# 27.6 ms — the ncells scatter at ~5 ns/element — vs ~1 ms to sort the
# 120 k candidates; scratch/mb_books.py).
UNIQUE_DENSE_RATIO = 4


def unique_coords(coords, valid_mask, spatial_shape, capacity):
    """Deduplicate coords per sample into a fixed-capacity, key-sorted set.

    Returns (out_coords [B, capacity, 3], out_num [B], sorted_keys [B, capacity]).
    The output is sorted by key, so its hash table is (sorted_keys, arange).
    Voxels beyond ``capacity`` (the largest keys) are dropped.

    Small grids skip the sort entirely: scatter an occupancy bit per cell,
    rank the set cells by cumulative sum, and scatter each cell id to its
    rank — O(ncells) bandwidth instead of an O(V log V) sort. Large grids
    sort the V candidates instead: every op is O(V), independent of grid
    size.
    """
    keys = make_table_keys(coords, valid_mask, spatial_shape)
    nc = int(np.prod([int(s) for s in spatial_shape]))
    V = keys.shape[-1]

    if nc <= UNIQUE_DENSE_RATIO * V:

        def one(k):
            idx = jnp.where(k == INVALID_KEY, nc, k)
            mask = jnp.zeros((nc,), jnp.int32).at[idx].set(1, mode="drop")
            ranks = jnp.cumsum(mask)  # 1-based rank at set cells
            total = ranks[-1]
            pos = jnp.where((mask == 1) & (ranks <= capacity),
                            ranks - 1, capacity)
            cells = jax.lax.iota(jnp.int32, nc)
            out = jnp.full((capacity + 1,), INVALID_KEY, jnp.int32)
            out = out.at[pos].set(cells, mode="drop")
            return out[:capacity], jnp.minimum(total, capacity).astype(
                jnp.int32)

    else:

        def one(k):
            sk = jnp.sort(k)  # INVALID_KEY pads sort to the end
            first = (sk != jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), sk[:-1]])
            ) & (sk != INVALID_KEY)
            ranks = jnp.cumsum(first.astype(jnp.int32))  # 1-based at firsts
            total = ranks[-1]
            pos = jnp.where(first & (ranks <= capacity), ranks - 1, capacity)
            out = jnp.full((capacity + 1,), INVALID_KEY, jnp.int32)
            out = out.at[pos].set(sk, mode="drop")
            return out[:capacity], jnp.minimum(total, capacity).astype(
                jnp.int32)

    ukeys, num = jax.vmap(one)(keys)
    out_coords = delinearize(ukeys, spatial_shape)
    return out_coords.astype(jnp.int32), num, ukeys
