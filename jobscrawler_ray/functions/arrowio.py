"""Small shared Arrow interop helpers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def arrow_out(df: pd.DataFrame) -> pa.Table:
    """pandas → metadata-free Arrow for map stages that feed shuffles
    or writes: pandas-converted blocks embed a ``pandas`` schema-metadata
    dict that makes ``pa.Schema`` unhashable, defeating Ray's schema
    dedup and spamming 'Failed to hash the schemas' warnings at every
    downstream unify."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
