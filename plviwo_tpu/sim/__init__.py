"""Simulation backend: SE(3) B-spline trajectories + synthetic sensor generators."""
