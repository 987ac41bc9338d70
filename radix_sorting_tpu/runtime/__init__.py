"""Native host runtime: compiled IO, verification, and oracle bindings."""

from . import native  # noqa: F401
