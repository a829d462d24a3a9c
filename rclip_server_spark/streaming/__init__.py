"""Structured Streaming operators over the `events` stream (SURVEY.md §F).

No reference equivalent exists (the reference is batch+serving only); the
semantics contract is therefore *streaming output == batch output* on the
same data, which is exactly how the tests check it (SURVEY.md §5.5).
"""

from . import windows  # noqa: F401
