"""Device compute primitives.

These are the TPU-native replacements for the reference's segment-iterator
inner loops (ref: storage/segment_iterate.hpp) and operator algorithm steps
(ref: operators/join_hash/join_hash_steps.hpp, aggregate_hash.cpp, sort.cpp).
Everything here is a pure function on padded 1-D jax arrays with static
shapes; data-dependent result sizes are handled by the two-phase
count -> bucket -> expand pattern (the central TPU design problem: XLA needs
static shapes, selections/joins produce dynamic cardinalities).
"""
