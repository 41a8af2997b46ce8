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


def unique_coords(coords, valid_mask, spatial_shape, capacity):
    """Deduplicate coords per sample into a fixed-capacity, key-sorted set.

    Returns (out_coords [B, capacity, 3], out_num [B], sorted_keys [B, capacity]).
    The output is sorted by key, so its hash table is (sorted_keys, arange).
    Voxels beyond ``capacity`` (the largest keys) are dropped.
    """
    keys = make_table_keys(coords, valid_mask, spatial_shape)

    def one(k):
        uk = jnp.unique(k, size=capacity, fill_value=INVALID_KEY)
        n = jnp.sum(uk != INVALID_KEY).astype(jnp.int32)
        return uk.astype(jnp.int32), n

    ukeys, num = jax.vmap(one)(keys)
    out_coords = delinearize(ukeys, spatial_shape)
    return out_coords.astype(jnp.int32), num, ukeys
