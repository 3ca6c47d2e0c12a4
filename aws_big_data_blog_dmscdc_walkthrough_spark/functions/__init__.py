"""Reusable JVM-side expression primitives: hashing, vector math."""

from . import hashing, vectors  # noqa: F401
