"""Verification, dataset, and measurement utilities."""

from . import keyfile, verify  # noqa: F401
