"""Progress-callback invoker with retry/backoff.

Parity with the reference's HTTP progress callbacks
(``/root/reference/docling_jobkit/orchestrators/callback_invoker.py:19-110``:
ProgressSetNumDocs -> DocumentCompleted* -> UpdateProcessed, POSTed with
retries) — transport-agnostic here (no network in the sandbox): the sink is
any callable; an HTTP deployment passes a requests-based sender.

Failure policy mirrors the reference: callback failures are logged and
retried with backoff but NEVER fail the pipeline (progress is advisory).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

EVENT_SET_NUM_DOCS = "SET_NUM_DOCS"
EVENT_DOCUMENT_COMPLETED = "DOCUMENT_COMPLETED"
EVENT_UPDATE_PROCESSED = "UPDATE_PROCESSED"


@dataclass
class CallbackInvoker:
    sink: Callable[[dict], None]
    max_retries: int = 3
    retry_delay_s: float = 0.05
    backoff: float = 2.0
    # failures are swallowed (advisory channel); counted for observability
    n_sent: int = 0
    n_failed: int = 0
    failures: list[str] = field(default_factory=list)

    def emit(self, event: str, **payload) -> bool:
        msg = {"event": event, **payload}
        delay = self.retry_delay_s
        for attempt in range(self.max_retries + 1):
            try:
                self.sink(msg)
                self.n_sent += 1
                return True
            except Exception as exc:
                if attempt == self.max_retries:
                    self.n_failed += 1
                    self.failures.append(f"{event}: {type(exc).__name__}: {exc}")
                    return False
                time.sleep(delay)
                delay *= self.backoff
        return False

    # -- convenience emitters matching the reference sequence ---------------
    def set_num_docs(self, total: int) -> bool:
        return self.emit(EVENT_SET_NUM_DOCS, total=total)

    def document_completed(self, key: str, status: str, index: int, total: int) -> bool:
        return self.emit(
            EVENT_DOCUMENT_COMPLETED, key=key, status=status, index=index, total=total
        )

    def update_processed(self, num_succeeded: int, num_failed: int) -> bool:
        return self.emit(
            EVENT_UPDATE_PROCESSED,
            num_succeeded=num_succeeded,
            num_failed=num_failed,
        )


def progress_callback_from_invoker(invoker: CallbackInvoker, total_shards: int):
    """Adapter for run_extract_checkpointed_fused(progress_callback=...):
    emits SET_NUM_DOCS once, then DOCUMENT_COMPLETED per shard."""
    state = {"i": 0}
    invoker.set_num_docs(total_shards)

    def cb(rec: dict) -> None:
        state["i"] += 1
        invoker.document_completed(
            key=rec["shard_key"],
            status="SUCCESS" if rec.get("parse_failures", 0) == 0 else "PARTIAL_SUCCESS",
            index=state["i"],
            total=total_shards,
        )

    return cb
