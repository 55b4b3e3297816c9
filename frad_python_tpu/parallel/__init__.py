"""Distributed frame-batch pipeline (mesh sharding, halo exchange)."""
