"""WebDataset-style tar shard assembly — the packaging format
GPU training jobs stream (one tar per shard, members ``<key>.img`` /
``<key>.txt`` interleaved so a sequential reader gets sample-aligned
records). Shared LEAF kernel: the engine's per-shard ``map_groups``
task and the sequential golden both call :func:`build_wds_tar` on
their own member lists — orchestration (shard assignment, grouping,
ordering) stays independent per the goldens contract.

Byte-determinism: USTAR format, mtime=0, uid/gid=0, fixed mode, and
the caller passes members in a deterministic order — identical input
⇒ identical tar bytes ⇒ comparable sha256.
"""

from __future__ import annotations

import io
import tarfile


def build_wds_tar(members: list[tuple[str, bytes, str]]) -> bytes:
    """``members`` = [(key, image_bytes, caption)] in the caller's
    (deterministic) order; returns the tar archive bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for key, img, caption in members:
            for name, payload in ((f"{key}.img", img),
                                  (f"{key}.txt",
                                   caption.encode("utf-8"))):
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()
