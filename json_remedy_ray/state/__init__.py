"""Partitioning, salting, checkpoint manifests."""
