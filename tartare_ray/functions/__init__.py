"""Scalar / vectorized helper functions + the transform-step registry.

Reference analogue: tartare's preprocess helpers scattered through
`tartare/processes/*` and `tartare/core/*` `[UNVERIFIED — empty
checkout, SURVEY.md §0]`, re-expressed as pure vectorized kernels over
Arrow/numpy so they run zero-copy inside ``map_batches``.
"""
