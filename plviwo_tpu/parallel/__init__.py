"""Distributed layer: device meshes, sequence-sharded replay, Schur-complement BA."""
