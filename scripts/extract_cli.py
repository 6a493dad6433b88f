#!/usr/bin/env python
"""CLI analog of the reference's `pdftext` command
(scripts/extract_text.py): extract one conversation (a parquet/JSONL of
turns, or a directory of payload files) to plain text or JSON.

    python scripts/extract_cli.py INPUT [--out_path P] [--json] [--sort]
        [--keep_hyphens] [--pages "0,5-10,12"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdftext_spark.api_compat import (  # noqa: E402
    dictionary_output,
    parse_range_str,
    plain_text_output,
)


def _load_turns(path: str) -> tuple[list[str], list[str]]:
    """(texts, roles) in turn order. Roles matter: tool turns must route
    to the HTML main-content path exactly like the Spark operator routes
    them — dropping the column would emit raw boilerplate HTML for those
    turns. Inputs without a role column default every turn to 'user'."""
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq
        t = pq.read_table(path)
        roles = (t["role"].to_pylist() if "role" in t.column_names
                 else ["user"] * t.num_rows)
        rows = sorted(zip(t["turn_idx"].to_pylist(), t["text"].to_pylist(),
                          roles))
        return [x for _, x, _r in rows], [r for _, _x, r in rows]
    if path.endswith(".jsonl"):
        with open(path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        rows.sort(key=lambda r: r.get("turn_idx", 0))
        return ([r["text"] for r in rows],
                [r.get("role", "user") for r in rows])
    with open(path) as f:
        return [f.read()], ["user"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--out_path", default=None)
    ap.add_argument("--json", action="store_true", help="JSON page dicts")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--keep_hyphens", action="store_true")
    ap.add_argument("--pages", default=None, help="e.g. '0,5-10,12'")
    ap.add_argument("--disable_links", action="store_true")
    args = ap.parse_args()

    payloads, roles = _load_turns(args.input)
    page_range = None
    if args.pages:
        page_range = parse_range_str(args.pages)
        # validation mirrors scripts/extract_text.py:43
        assert all(0 <= p <= len(payloads) for p in page_range), \
            "Invalid page range"

    if args.json:
        pages = dictionary_output(payloads, sort=args.sort,
                                  page_range=page_range,
                                  disable_links=args.disable_links,
                                  roles=roles)
        text = json.dumps(pages, ensure_ascii=False)
    else:
        text = plain_text_output(payloads, sort=args.sort,
                                 hyphens=args.keep_hyphens,
                                 page_range=page_range, roles=roles)

    if args.out_path is None:
        print(text)
    else:
        with open(args.out_path, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
