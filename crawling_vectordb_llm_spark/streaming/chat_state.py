"""Chat-session state (G2) — the reference holds per-session ordered
message history + an opaque KV cache in Streamlit session state
(main_server.py:69-72, 167-169).  Engine analog: applyInPandasWithState
keyed by session_id, state = the ordered history (and an opaque blob slot
standing in for past_key_values).  Generation itself stays a serving
concern (SURVEY §2.6); the engine owns the history table.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _update_history(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (history_json,) = state.get if state.exists else ("[]",)
    history = json.loads(history_json)
    new_turns = []
    for pdf in pdfs:
        for r in pdf.sort_values(["turn_id"]).itertuples():
            new_turns.append({"role": r.role, "content": r.content})
    history.extend(new_turns)
    state.update((json.dumps(history),))
    yield pd.DataFrame(
        {
            "session_id": [key[0]],
            "n_turns": [len(history)],
            "last_content": [history[-1]["content"] if history else None],
            "history_json": [json.dumps(history)],
        }
    )


def run_chat_history_stream(messages_stream: DataFrame) -> DataFrame:
    """messages(session_id long, turn_id long, role string, content string)
    → per-session accumulated history (update mode emissions)."""
    return messages_stream.groupBy("session_id").applyInPandasWithState(
        _update_history,
        outputStructType=(
            "session_id long, n_turns long, last_content string, history_json string"
        ),
        stateStructType="history_json string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
