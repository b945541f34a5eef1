"""Glyph classifier — the deterministic stand-in for the reference's Keras
digit models (/root/reference/app.py:45-46), with the serving 12-class
alphabet (0-9, 10='-', 11='x'; app.py:219).

``GlyphClassifier`` is the per-actor "model": construction builds the weight
table once (the ``tf.keras.models.load_model`` analog, app.py:44-48); the
batch path classifies many cell tokens in one call, fixing the reference's
one-``predict``-per-cell inefficiency (utils/table_rec.py:67) without
changing per-token results.
"""
from __future__ import annotations

from ..layouts import GLYPH_TABLE, classify_glyph


class GlyphClassifier:
    """Stateful classifier: load once per actor, predict per token/batch."""

    def __init__(self) -> None:
        # "Load the model": copy the weight table into instance state so a
        # swapped registry (the pluggable-weights surface, app.py:45-48)
        # only requires a different constructor arg.
        self._table = dict(GLYPH_TABLE)

    def predict(self, token: str) -> tuple[int, float]:
        tok = token.strip()
        if tok in self._table:
            return self._table[tok]
        return classify_glyph(tok)

    def predict_many(self, tokens: list[str]) -> list[tuple[int, float]]:
        """Batched inference — one call for all cells of a batch of turns."""
        return [self.predict(t) for t in tokens]
