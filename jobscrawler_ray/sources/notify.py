"""Operational alerting seam (S12).

The reference ships crawl-log summaries to a Discord webhook —
``src/logs_in_discord.py:55-124``: one summary message (counts per log
pattern as a JSON code block) followed by chunked detail posts under
Discord's message-size limit. In this engine the durable per-wave
metrics already land in checkpoint manifests; this seam POSTs the same
run summary to ANY webhook URL (Discord-compatible ``{"content": ...}``
payload), preserving the reference's chunking behavior. Alerting must
never fail the pipeline: callers treat post failures as warnings.
"""

from __future__ import annotations

import json
from typing import Any

# Discord's limit is 2000 chars; the reference wraps content in code
# fences, so leave headroom (logs_in_discord.py chunks the same way)
MAX_CHUNK = 1900


class WebhookNotifier:
    """POSTs JSON ``{"content": text}`` messages to a webhook URL.
    ``opener`` is injectable for tests (anything with
    ``open(request, timeout=...)``); the default stdlib opener is only
    constructed on first use, so importing this module needs no
    network stack."""

    def __init__(self, url: str, timeout: float = 10.0, opener=None):
        self.url = url
        self.timeout = timeout
        self._opener = opener

    def _get_opener(self):
        if self._opener is None:
            import urllib.request

            self._opener = urllib.request.build_opener()
        return self._opener

    def post(self, text: str) -> int:
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=json.dumps({"content": text}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with self._get_opener().open(req, timeout=self.timeout) as resp:
            return int(resp.status)

    def send_summary(self, title: str, summary: dict[str, Any]) -> int:
        """Reference shape: one title line + the summary as a JSON code
        block, split into ≤MAX_CHUNK posts when large. Returns the
        number of messages posted."""
        body = json.dumps(summary, indent=2, default=str)
        text = f"**{title}**\n```json\n{body}\n```"
        if len(text) <= MAX_CHUNK:
            self.post(text)
            return 1
        n = 0
        self.post(f"**{title}**")
        n += 1
        for i in range(0, len(body), MAX_CHUNK):
            self.post(f"```json\n{body[i:i + MAX_CHUNK]}\n```")
            n += 1
        return n
