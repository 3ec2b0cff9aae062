"""Device->host transfer packing.

Two reasons to never transfer raw mixed-dtype pytrees off-device:

1. round trips: each leaf is a separate transfer; over a remote TPU link the
   latency dominates, so a block's outputs should leave the device as ONE
   buffer;
2. dtype support: some TPU runtimes only implement device->host copies for
   f32/i32 buffers (complex64/bool transfers raise UNIMPLEMENTED; float64 is
   safest avoided).

`pack_tree` is jit-traceable: inside the device program it reshapes every
leaf to [*batch, lanes] float32 — complex64 as re/im lanes, float64 as a
hi/lo float-float pair (~48 significant bits preserved), bool/int32 as exact
float lanes (values must fit in 24 bits; sample counts and window-relative
positions do) — and concatenates along the last axis. `unpack_tree`
reverses it on host in NumPy.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LeafSpec:
    key: str
    kind: str          # "f32" | "c64" | "f64" | "int" | "bool"
    lanes: int         # lanes consumed in the packed tensor
    trailing: tuple    # leaf shape beyond the shared batch dims


@dataclass(frozen=True)
class PackSpec:
    batch_ndim: int
    leaves: tuple[LeafSpec, ...]

    @property
    def total_lanes(self) -> int:
        return sum(l.lanes for l in self.leaves)


def _kind_of(dtype) -> str:
    d = np.dtype(dtype)
    if d == np.complex64:
        return "c64"
    if d == np.float64:
        return "f64"
    if d == np.float32:
        return "f32"
    if d == np.bool_:
        return "bool"
    if d in (np.int32, np.int64):
        return "int"
    raise TypeError(f"hostpack: unsupported dtype {d}")


def make_spec(tree: dict, batch_ndim: int) -> PackSpec:
    """Build the packing spec from a {name: array} dict (shapes/dtypes only)."""
    leaves = []
    for key in sorted(tree):
        v = tree[key]
        trailing = tuple(v.shape[batch_ndim:])
        n = int(np.prod(trailing)) if trailing else 1
        kind = _kind_of(v.dtype)
        lanes = 2 * n if kind in ("c64", "f64") else n
        leaves.append(LeafSpec(key, kind, lanes, trailing))
    return PackSpec(batch_ndim, tuple(leaves))


def pack_tree(tree: dict, spec: PackSpec) -> jnp.ndarray:
    """[*batch, total_lanes] float32 packed tensor (traceable)."""
    parts = []
    batch = None
    for leaf in spec.leaves:
        v = tree[leaf.key]
        batch = v.shape[: spec.batch_ndim]
        flat = v.reshape(*batch, -1)
        if leaf.kind == "c64":
            parts.append(jnp.real(flat).astype(jnp.float32))
            parts.append(jnp.imag(flat).astype(jnp.float32))
        elif leaf.kind == "f64":
            hi = flat.astype(jnp.float32)
            lo = (flat - hi.astype(jnp.float64)).astype(jnp.float32)
            parts.append(hi)
            parts.append(lo)
        else:
            parts.append(flat.astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def unpack_tree(packed: np.ndarray, spec: PackSpec) -> dict:
    """Reverse pack_tree on host; returns {name: np.ndarray}."""
    packed = np.asarray(packed)
    batch = packed.shape[:-1]
    out = {}
    ofs = 0
    for leaf in spec.leaves:
        n = int(np.prod(leaf.trailing)) if leaf.trailing else 1
        shape = batch + leaf.trailing
        if leaf.kind == "c64":
            re = packed[..., ofs : ofs + n]
            im = packed[..., ofs + n : ofs + 2 * n]
            out[leaf.key] = (re + 1j * im).astype(np.complex64).reshape(shape)
            ofs += 2 * n
        elif leaf.kind == "f64":
            hi = packed[..., ofs : ofs + n].astype(np.float64)
            lo = packed[..., ofs + n : ofs + 2 * n].astype(np.float64)
            out[leaf.key] = (hi + lo).reshape(shape)
            ofs += 2 * n
        elif leaf.kind == "bool":
            out[leaf.key] = (packed[..., ofs : ofs + n] > 0.5).reshape(shape)
            ofs += n
        elif leaf.kind == "int":
            out[leaf.key] = (
                np.round(packed[..., ofs : ofs + n]).astype(np.int64).reshape(shape)
            )
            ofs += n
        else:
            out[leaf.key] = (
                packed[..., ofs : ofs + n].astype(np.float32).reshape(shape)
            )
            ofs += n
    return out
