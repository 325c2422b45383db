"""Repo tooling (oracle mirror, reseeded fixtures, scale sweep) —
importable so pytest gates can drive the same code paths the manual
verification recipe uses."""
