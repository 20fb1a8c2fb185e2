"""Alias package mirroring the reference's ``spotlight.datasets``."""
