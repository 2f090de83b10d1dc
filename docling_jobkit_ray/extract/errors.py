"""Typed extraction error taxonomy.

Mirrors the reference's public failure model
(``/root/reference/docling_jobkit/public_errors.py:90-175``): every failure
carries a ``category`` in {policy, source_unavailable, timeout, capacity,
internal}, a ``retryable`` flag and a ``phase``.  Expected per-document
failures are absorbed inside the UDF and routed to the dead-letter dataset
(reference precedent: degrade chunk failure to a document-level FAILURE row,
``serve_deployment.py:1502-1546``); Ray-level retries are reserved for infra
faults only.
"""

from __future__ import annotations

# Failure categories (public_errors.py:17-27 equivalent).
CATEGORY_POLICY = "policy"
CATEGORY_SOURCE_UNAVAILABLE = "source_unavailable"
CATEGORY_TIMEOUT = "timeout"
CATEGORY_CAPACITY = "capacity"
CATEGORY_INTERNAL = "internal"

# Processing phases.
PHASE_PREFLIGHT = "preflight"
PHASE_DECODE = "decode"
PHASE_PARSE = "parse"
PHASE_ASSEMBLE = "assemble"

# Status values (mirror docling's ConversionStatus usage, convert/export.py:39-40).
STATUS_SUCCESS = "SUCCESS"
STATUS_PARTIAL_SUCCESS = "PARTIAL_SUCCESS"
STATUS_FAILURE = "FAILURE"


class ExtractError(Exception):
    """Base class for expected, per-document extraction failures."""

    category = CATEGORY_INTERNAL
    retryable = False
    phase = PHASE_PARSE

    def __init__(self, message: str, *, phase: str | None = None):
        super().__init__(message)
        if phase is not None:
            self.phase = phase


class EmptyPayloadError(ExtractError):
    category = CATEGORY_SOURCE_UNAVAILABLE
    retryable = False
    phase = PHASE_PREFLIGHT


class PayloadTooLargeError(ExtractError):
    """Admission limit, like the reference's max_file_size preflight
    (``convert/materialization.py:61-94``)."""

    category = CATEGORY_POLICY
    retryable = False
    phase = PHASE_PREFLIGHT


class TooManyPagesError(ExtractError):
    """Page-count admission limit (``materialization.py:158-213``)."""

    category = CATEGORY_POLICY
    retryable = False
    phase = PHASE_PREFLIGHT


class DocumentTimeoutError(ExtractError):
    """Per-document wall-clock budget exceeded (the reference's
    ``document_timeout``, ``orchestrators/ray/config.py:369-371``): a
    pathological payload must dead-letter, not stall an actor forever.
    Retryable, mirroring the reference's retry-then-fail policy for
    timeouts (load-induced timeouts can succeed on a quieter worker)."""

    category = CATEGORY_TIMEOUT
    retryable = True
    phase = PHASE_PARSE

    def __init__(
        self,
        message: str = "document exceeded wall-clock budget",
        *,
        phase: str | None = None,
    ):
        # default message: the watchdog injects this class via
        # PyThreadState_SetAsyncExc, which instantiates it with no args
        super().__init__(message, phase=phase)


class DecodeError(ExtractError):
    """Payload is not valid UTF-8 where text was expected."""

    category = CATEGORY_INTERNAL
    retryable = False
    phase = PHASE_DECODE


class MalformedBinaryError(ExtractError):
    """Binary container fails structural validation (bad magic, bad page
    directory), like the reference's PDF structural preflight."""

    category = CATEGORY_INTERNAL
    retryable = False
    phase = PHASE_PREFLIGHT


def classify_exception(exc: BaseException) -> tuple[str, bool, str]:
    """Exception -> (category, retryable, phase).

    Unknown exceptions are ``internal``/non-retryable, matching the
    reference default (``public_errors.py:90-175``)."""
    if isinstance(exc, ExtractError):
        return exc.category, exc.retryable, exc.phase
    if isinstance(exc, (TimeoutError,)):
        return CATEGORY_TIMEOUT, True, PHASE_PARSE
    if isinstance(exc, (MemoryError,)):
        return CATEGORY_CAPACITY, True, PHASE_PARSE
    return CATEGORY_INTERNAL, False, PHASE_PARSE
