"""Deterministic stub chat model — the test seam for the LLM stage.

The reference binds ChatOpenAI(model="gpt-5-mini", temperature=0.0)
(generate_decisions_summaries.py:95) and validates responses against a
pydantic structured-output schema (:92-95). Live API calls are
non-deterministic and need secrets, so the engine's default model is this
stub (SURVEY.md §5.4): the summary is a content hash of the prompt and the
cost is a pure function of prompt length — every downstream operator
(structured-output parse, cost aggregation) stays exactly value-checkable.

A live model implements the same ``complete_batch`` contract; swap via the
``model_factory`` argument of ``llm.batch.summarize``.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Sequence

COST_PER_CHAR = 1e-6  # mirrors the reference's per-call cost accounting (U4)


class StubChatModel:
    """Batch-complete with deterministic structured-output JSON responses."""

    def complete_batch(self, prompts: Sequence[str]) -> list[dict]:
        out = []
        for p in prompts:
            digest = hashlib.sha256(p.encode("utf-8")).hexdigest()
            out.append(
                {
                    # structured output: JSON matching the reference's
                    # DecisionSummaryAgentResponse {summary: str} schema
                    "response_json": json.dumps({"summary": f"STUB:{digest}"}),
                    "cost": COST_PER_CHAR * len(p),
                }
            )
        return out
