"""Frame-of-Reference + fixed-bit-width packed device storage.

TPU-native redesign of the reference's compressed segments
(ref: storage/frame_of_reference_segment.hpp:39 — FOR with a per-block
frame; vector_compression/compressed_vector_type.hpp:28 — fixed-width
8/16/32-bit code vectors).  Instead of per-chunk frames and byte-aligned
code vectors we keep ONE frame (the column min) and pack values at a bit
width that divides 32, so every value lives inside a single uint32 word
and decode is exactly one shift+mask — pure VPU work that XLA fuses into
the consuming kernel.  The win on TPU is HBM bandwidth: a scan over a
16-bit-packed int64 column reads 4x fewer bytes.

Representation: value[i] == ((words[i // k] >> ((i % k) * bw)) & mask)
+ reference, with k = 32 // bw values per word and bw in {1,2,4,8,16,32}.

A PackedArray is deliberately NOT a jax.Array: any code path that was not
taught about packing fails loudly (AttributeError) instead of silently
computing on raw words.  Decode happens:
  * inside every compiled stage (operators/compiled.py _rebuild) — fused;
  * in Column.take / Column.to_numpy for eager gathers and host exports.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Bit widths that divide a 32-bit word: no value ever spans two words.
BIT_WIDTHS = (1, 2, 4, 8, 16, 32)


@dataclass(frozen=True)
class PackedArray:
    """FOR/bit-packed device column payload (see module docstring)."""

    words: jax.Array  # uint32, shape (capacity // k,)
    bit_width: int
    reference: int  # frame of reference (subtracted before packing)
    logical_dtype: str  # e.g. "int32", "int64" (host round-trip dtype)
    capacity: int  # logical element count (multiple of 32 // bit_width)
    # Device decode dtype: the NARROWEST int dtype holding the value range.
    # Decoding an int64 column whose live values fit int32 must yield int32
    # — TPU emulates 64-bit integers as pairs, so a widened join/sort key
    # pays a 2x sort/search tax that erases the bandwidth win.
    out_dtype: str = "int64"
    # The FOR reference as a PRE-UPLOADED 0-d device array: stages take it
    # as a traced input, and materializing it per dispatch would add one
    # tiny host->device transfer per packed column per stage (ruinous
    # through a remote TPU tunnel).
    reference_device: Optional[jax.Array] = None

    def reference_scalar(self) -> jax.Array:
        ref = self.reference_device
        if ref is None:
            ref = jnp.asarray(self.reference, dtype=jnp.dtype(self.out_dtype))
            object.__setattr__(self, "reference_device", ref)
        return ref

    @property
    def values_per_word(self) -> int:
        return 32 // self.bit_width

    @property
    def nbytes(self) -> int:
        return int(self.words.size) * 4

    def signature(self) -> tuple:
        """Static decode parameters — stage-cache key material.  The FOR
        reference is NOT part of the key: it enters compiled stages as a
        traced scalar, so re-generated tables (new min values) reuse the
        same executables."""
        return ("packed", self.bit_width, self.out_dtype, self.capacity)


def choose_bit_width(span: int) -> Optional[int]:
    """Smallest dividing-32 width holding values in [0, span]."""
    for bw in BIT_WIDTHS:
        if bw < 32 and span <= (1 << bw) - 1:
            return bw
        if bw == 32 and span <= (1 << 32) - 1:
            return bw
    return None


def encode_numpy(
    values: np.ndarray,
    valid: Optional[np.ndarray],
    n_rows: int,
    min_ratio: float = 2.0,
) -> Optional[PackedArray]:
    """Host-side encode of an integer column (padding/NULL rows pack as the
    reference value — they are masked by consumers anyway).  Returns None
    when packing would not shrink the column by at least `min_ratio`."""
    if values.dtype.kind not in ("i", "u"):
        return None
    cap = len(values)
    live = values[:n_rows]
    if valid is not None:
        live = live[valid[:n_rows]]
    if live.size == 0:
        return None
    ref = int(live.min())
    span = int(live.max()) - ref
    bw = choose_bit_width(span)
    if bw is None:
        return None
    ratio = values.dtype.itemsize * 8 / bw
    if ratio < min_ratio:
        return None
    k = 32 // bw
    if cap % k:
        return None  # capacities are LANE(128)-padded, so k always divides
    shifted = np.zeros(cap, dtype=np.uint64)
    shifted[:n_rows] = (values[:n_rows].astype(np.int64) - ref).astype(np.uint64)
    if valid is not None:
        shifted[:n_rows] = np.where(valid[:n_rows], shifted[:n_rows], 0)
    lanes = shifted.reshape(-1, k)
    words = np.zeros(cap // k, dtype=np.uint64)
    for j in range(k):
        words |= lanes[:, j] << np.uint64(j * bw)
    i32 = np.iinfo(np.int32)
    out_dtype = (
        "int32" if ref >= i32.min and ref + span <= i32.max
        else str(values.dtype)
    )
    return PackedArray(
        words=jnp.asarray(words.astype(np.uint32)),
        bit_width=bw,
        reference=ref,
        logical_dtype=str(values.dtype),
        capacity=cap,
        out_dtype=out_dtype,
    )


def unpack_device(words: jax.Array, packed: PackedArray,
                  reference=None) -> jax.Array:
    """Full-column decode (traced; XLA fuses into the consumer).  `words`
    is passed separately so this works on the traced stand-in inside a
    jitted stage while `packed` supplies the static constants.  `reference`
    may be a traced scalar (compiled stages pass it as an input so the
    executable is reference-independent); defaults to the baked value.
    Yields `packed.out_dtype` (value-correct narrowing): shifted values
    are bounded by span <= iinfo(out).max - ref, so the int-out add never
    overflows."""
    out_dtype = jnp.dtype(packed.out_dtype)
    ref = packed.reference if reference is None else reference
    bw = packed.bit_width
    if bw == 32:
        flat = words
    else:
        k = 32 // bw
        mask = jnp.uint32((1 << bw) - 1)
        shifts = (jnp.arange(k, dtype=jnp.uint32) * jnp.uint32(bw))
        flat = ((words[:, None] >> shifts[None, :]) & mask).reshape(-1)
    # uint32->int32 converts modularly and the int add wraps; since the
    # true value (ref + shifted) fits out_dtype, mod-2^32 arithmetic lands
    # exactly on it — no 64-bit intermediate needed.
    return flat.astype(out_dtype) + jnp.asarray(ref, dtype=out_dtype)


def take_packed(packed: PackedArray, indices: jax.Array) -> jax.Array:
    """Point decode-gather: values at `indices` (negative -> clamped 0)."""
    idx = jnp.maximum(indices, 0)
    bw = packed.bit_width
    out_dtype = jnp.dtype(packed.out_dtype)
    if bw == 32:
        flat = jnp.take(packed.words, idx, axis=0)
    else:
        k = 32 // bw
        w = jnp.take(packed.words, idx // k, axis=0)
        sh = (idx % k).astype(jnp.uint32) * jnp.uint32(bw)
        flat = (w >> sh) & jnp.uint32((1 << bw) - 1)
    return flat.astype(out_dtype) + jnp.asarray(packed.reference,
                                                dtype=out_dtype)


def decode_numpy(packed: PackedArray) -> np.ndarray:
    """Host-side full decode (test oracles, statistics builds)."""
    words = np.asarray(packed.words)
    bw = packed.bit_width
    if bw == 32:
        flat = words.astype(np.int64)
    else:
        k = 32 // bw
        shifts = (np.arange(k, dtype=np.uint32) * np.uint32(bw))
        flat = ((words[:, None] >> shifts[None, :]) & np.uint32((1 << bw) - 1))
        flat = flat.reshape(-1).astype(np.int64)
    return (flat + packed.reference).astype(np.dtype(packed.logical_dtype))


# ======================================================================
# Run-length encoding
# ======================================================================


@dataclass(frozen=True)
class RLEArray:
    """Run-length-encoded device column payload.

    TPU-native redesign of the reference's RunLengthSegment
    (ref: storage/run_length_segment.hpp:43 — values + end_positions).
    Decode is one searchsorted over the (sorted, cumulative) run ends
    plus a gather — O(log runs) VPU work per row — so RLE is only chosen
    when the run count is a small fraction of the row count (sorted /
    clustered columns), where the HBM-bandwidth saving dwarfs the
    binary-search compute.  Unlike FOR packing this also applies to
    float columns.

    Representation: value[i] == values[searchsorted(run_ends, i, 'right')]
    with run_ends strictly increasing, run_ends[n_runs-1] == capacity
    (the final run is extended over padding rows; consumers mask them).
    """

    values: jax.Array  # (runs_capacity,) run values, physical dtype
    run_ends: jax.Array  # (runs_capacity,) int32 exclusive end offsets
    n_runs: int
    capacity: int  # logical element count
    logical_dtype: str

    @property
    def nbytes(self) -> int:
        return int(self.values.size) * self.values.dtype.itemsize + int(
            self.run_ends.size) * 4

    def signature(self) -> tuple:
        return ("rle", str(self.values.dtype), int(self.values.shape[0]),
                self.capacity)


def encode_rle_numpy(
    values: np.ndarray,
    valid: Optional[np.ndarray],
    n_rows: int,
    min_ratio: float = 4.0,
    runs_pad: int = 128,
) -> Optional[RLEArray]:
    """Host-side RLE encode; None unless the column shrinks by at least
    `min_ratio` (decode pays a per-row binary search, so RLE must win big
    to be worth choosing).  NULL-bearing columns decline (validity would
    need its own run structure)."""
    if valid is not None and not bool(valid[:n_rows].all()):
        return None
    cap = len(values)
    if n_rows == 0:
        return None
    live = values[:n_rows]
    change = np.flatnonzero(live[1:] != live[:-1])
    n_runs = int(change.size) + 1
    runs_cap = -(-max(n_runs, 1) // runs_pad) * runs_pad
    ratio = (cap * values.dtype.itemsize) / (
        runs_cap * (values.dtype.itemsize + 4))
    if ratio < min_ratio:
        return None
    starts = np.concatenate([[0], change + 1])
    run_vals = np.zeros(runs_cap, dtype=values.dtype)
    run_vals[:n_runs] = live[starts]
    ends = np.full(runs_cap, cap, dtype=np.int32)
    ends[: n_runs - 1] = (change + 1).astype(np.int32)
    # final run extends over padding rows (masked by consumers)
    return RLEArray(
        values=jnp.asarray(run_vals),
        run_ends=jnp.asarray(ends),
        n_runs=n_runs,
        capacity=cap,
        logical_dtype=str(values.dtype),
    )


def unrle_device(values: jax.Array, run_ends: jax.Array,
                 rle: RLEArray) -> jax.Array:
    """Full-column decode (traced; the searchsorted+gather fuses into the
    consuming stage).  `values`/`run_ends` are passed separately so this
    works on traced stand-ins inside jitted stages."""
    iota = jnp.arange(rle.capacity, dtype=jnp.int32)
    idx = jnp.searchsorted(run_ends, iota, side="right")
    return jnp.take(values, jnp.minimum(idx, values.shape[0] - 1))


def take_rle(rle: RLEArray, indices: jax.Array) -> jax.Array:
    """Point decode-gather: values at `indices` (negative -> clamped 0)."""
    idx = jnp.maximum(indices, 0).astype(jnp.int32)
    run = jnp.searchsorted(rle.run_ends, idx, side="right")
    return jnp.take(rle.values, jnp.minimum(run, rle.values.shape[0] - 1))


def decode_rle_numpy(rle: RLEArray) -> np.ndarray:
    """Host-side full decode (test oracles, statistics builds)."""
    ends = np.asarray(rle.run_ends)
    vals = np.asarray(rle.values)
    idx = np.searchsorted(ends, np.arange(rle.capacity), side="right")
    return vals[np.minimum(idx, vals.shape[0] - 1)].astype(
        np.dtype(rle.logical_dtype))
