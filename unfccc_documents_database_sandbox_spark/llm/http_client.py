"""Minimal HTTP chat-model client — the live-endpoint seam for the LLM
stage (the shape a real OpenAI-compatible backend plugs into; reference
generate_decisions_summaries.py:95 binds ChatOpenAI over HTTPS the same
way).

Contract mirrors ``StubChatModel.complete_batch``: one POST per Arrow
batch with ``{"prompts": [...]}``, expecting ``{"results": [{
"response_json": ..., "cost": ...}, ...]}``. Transport failures — HTTP
4xx/5xx (urllib raises ``HTTPError``), connection resets, timeouts —
propagate as exceptions; the per-batch exponential-backoff retry in
``llm.batch.summarize`` (the tenacity analog, reference
requirements.txt:66) owns recovery, so this client stays deliberately
retry-free: ONE retry policy, at the stage level, not two stacked ones.

Instances are created inside the Python worker (``model_factory``
closure), so each executor fans out its own connections — throughput
scales with partitions instead of being capped by one driver-side client.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Sequence


class HttpChatModel:
    """Batch-complete against an OpenAI-compatible-ish HTTP endpoint."""

    def __init__(self, endpoint: str, timeout: float = 10.0):
        self.endpoint = endpoint
        self.timeout = timeout

    def complete_batch(self, prompts: Sequence[str]) -> list[dict]:
        payload = json.dumps({"prompts": list(prompts)}).encode("utf-8")
        req = urllib.request.Request(
            self.endpoint,
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = json.load(resp)
        except urllib.error.HTTPError as exc:
            # rate-limit hardening (VERDICT r10 #7): surface the server's
            # own 429 Retry-After window to the stage-level retry loop —
            # the one retry policy — as a ``retry_after`` attribute
            hint = exc.headers.get("Retry-After") if exc.headers else None
            if exc.code == 429 and hint is not None:
                try:
                    exc.retry_after = float(hint)
                except ValueError:
                    pass  # HTTP-date form: fall back to the backoff curve
            raise
        results = body["results"]
        # fail LOUDLY at the seam: a dropped/reordered/empty results list
        # with HTTP 200 would otherwise misalign doc->summary pairing deep
        # inside the mapInPandas stage (r06 review finding)
        if len(results) != len(prompts):
            raise ValueError(
                f"endpoint returned {len(results)} results for "
                f"{len(prompts)} prompts"
            )
        return results
