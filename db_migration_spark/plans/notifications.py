"""Step notifications — the ``notifications.around`` analog
(``/root/reference/src/azanium/notifications.py:36-124``).

The reference wraps every migration step with Slack webhook posts built
from attachment dicts (title/text/fields/ts).  Here the payload builder is
a pure function (same attachment shape, F14 dict→JSON mapping) and the
transport is pluggable: a JSON-lines file sink by default, an HTTP POST
when a webhook URL is configured (network-gated).  Retries mirror the
reference's 3-attempt policy (``notifications.py:33,54-63``).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable


def attachment(
    title: str,
    text: str,
    fields: dict[str, str] | None = None,
    color: str = "#36a64f",
) -> dict:
    """Slack-attachment payload (notifications.py:85-124): fields become
    short when value length ≤ 120, exactly the reference's rule
    (notifications.py:117)."""
    return {
        "color": color,
        "title": title,
        "text": text,
        "fields": [
            {"title": k, "value": v, "short": len(str(v)) <= 120}
            for k, v in (fields or {}).items()
        ],
        "ts": int(time.time()),
    }


def step_listener(
    sink: Callable[[dict], None] | None = None,
    log_path: str | None = None,
):
    """Build a Pipeline listener that emits an attachment per step event
    (the notifications.around wrapper, notifications.py:75-82)."""

    def file_sink(payload: dict) -> None:
        with open(log_path, "a") as fp:
            fp.write(json.dumps(payload) + "\n")

    emit = sink or (file_sink if log_path else lambda p: None)

    colors = {"start": "#439fe0", "ok": "#36a64f", "error": "#d00000"}

    def listener(phase: str, n: int, step) -> None:
        emit(
            attachment(
                title=f"step {n}: {step.description}",
                text=f"phase={phase}",
                fields={"step": str(n), "phase": phase},
                color=colors.get(phase, "#cccccc"),
            )
        )

    return listener


def post_webhook(url: str, payload: dict, retries: int = 3) -> bool:
    """HTTP transport with the reference's retry policy (3 attempts,
    notifications.py:54-63).  Network-gated; returns success."""
    import urllib.request

    body = json.dumps({"attachments": [payload]}).encode()
    for _ in range(retries):
        try:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                if 200 <= resp.status < 300:
                    return True
        except Exception:  # noqa: BLE001 - retry loop
            time.sleep(0.5)
    return False
