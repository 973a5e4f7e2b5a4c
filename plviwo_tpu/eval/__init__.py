"""L7 evaluation toolkit: trajectory alignment, ATE/RPE/NEES, file IO.

Rebuild of `open_vins/ov_eval` (SURVEY.md 2.9): the 12 CLI binaries become
subcommands of `python -m plviwo_tpu.eval` (ate / rpe / nees / compare /
convert), backed by the same math: posyaw/se3/sim3 Umeyama alignment,
ATE/RPE statistics, NEES from est/std/gt triplets.
"""
