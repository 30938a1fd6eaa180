"""Batch clean stage: the per-strategy M11 normalization as a
``map_batches`` callable class (regexes compiled once per actor via
module import; masks per strategy family — see functions/textclean.py).

The reference runs one cleaner per strategy engine over its combined
DataFrame (``src/crawler.py:354``); here one stage handles mixed-strategy
batches with boolean masks, so the records Dataset stays a single
pipeline."""

from __future__ import annotations

import pandas as pd

from ..functions.textclean import CLEAN_COLUMNS, clean_location, strip_html_chars


class CleanRecords:
    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.copy()
        for strategy in df["strategy"].unique():
            mask = df["strategy"] == strategy
            cols = CLEAN_COLUMNS.get(strategy, ("description", "location"))
            for col in cols:
                if col not in df.columns:
                    continue
                vals = df.loc[mask, col].tolist()
                df.loc[mask, col] = (
                    clean_location(vals) if col == "location" else strip_html_chars(vals)
                )
        return df
