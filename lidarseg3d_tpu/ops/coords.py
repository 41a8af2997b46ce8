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
