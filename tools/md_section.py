"""Shared helper for tuning tools that each own one marked section of
TUNING.md, so `ivf_pq_tuning.py` and `lsh_tuning.py` can be re-run in
any order without clobbering each other's tables."""

from __future__ import annotations

import os


def replace_section(path: str, marker: str, content: str,
                    header: str | None = None) -> None:
    """Replace (or append) the block delimited by ``<!-- marker -->`` /
    ``<!-- /marker -->`` in ``path`` with ``content``.  If the file does
    not exist it is created with ``header`` (if given) on top."""
    begin, end = f"<!-- {marker} -->", f"<!-- /{marker} -->"
    block = f"{begin}\n{content.rstrip()}\n{end}\n"
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    else:
        text = (header.rstrip() + "\n\n") if header else ""
    if begin in text:
        b = text.index(begin)
        # The end marker must FOLLOW the begin marker; a stray end
        # marker before it (hand-edited file) would otherwise splice
        # the file silently, duplicating or dropping content.
        e = text.find(end, b)
        if e < 0:
            raise ValueError(
                f"{path}: end marker {end!r} not found after begin "
                f"marker {begin!r} — file corrupted, refusing to edit")
        pre = text[:b]
        post = text[e + len(end):].lstrip("\n")
        text = pre + block + ("\n" + post if post else "")
    else:
        if text and not text.endswith("\n"):
            text += "\n"
        text += ("\n" if text else "") + block
    with open(path, "w") as f:
        f.write(text)
