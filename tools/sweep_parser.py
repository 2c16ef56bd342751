#!/usr/bin/env python
"""Full-corpus identity sweep for the fast HTML tokenizer.

Compares ``functions.html._fast_feed`` against the stdlib
``HTMLParser(convert_charrefs=True)`` on every page of a cached bench
world plus a randomized tag-soup fuzz, using coalesced-DOM signatures
(handler-call granularity may differ; concatenation is contractual).
Run after ANY change to functions/html.py (CLAUDE.md invariant); the
seed-fixed subset lives in test_extraction, this is the exhaustive
version.

Usage: python tools/sweep_parser.py [world_dir]
Exit 0 = zero divergence (bails are fine — they fall back to stdlib).
"""

from __future__ import annotations

import glob
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from ftw_crawler_spark.functions import html as H  # noqa: E402


def dom_sig(node):
    out = [("o", node.tag, tuple(sorted(node.attrs.items())))]
    buf = []
    for c in node.children:
        if isinstance(c, H.Node):
            if buf:
                out.append(("d", "".join(buf)))
                buf = []
            out.extend(dom_sig(c))
        else:
            buf.append(c)
    if buf:
        out.append(("d", "".join(buf)))
    out.append(("c", node.tag))
    return out


def check(s: str) -> str:
    b = H._TreeBuilder()
    b.feed(s)
    b.close()
    ref = dom_sig(b.root)
    b2 = H._TreeBuilder()
    try:
        H._fast_feed(s, b2)
    except H._Bail:
        return "bail"
    if dom_sig(b2.root) != ref:
        print("DIVERGENCE:", repr(s[:200]), file=sys.stderr)
        return "diverge"
    return "ok"


def main() -> int:
    world = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/ftw_bench_world_300000"
    stats = {"ok": 0, "bail": 0, "diverge": 0}
    for f in sorted(glob.glob(f"{world}/pages.parquet/*.parquet")):
        for h in pq.read_table(f, columns=["html"]).column("html") \
                .to_pylist():
            s = h if isinstance(h, str) else h.decode(
                H.sniff_encoding(h))
            stats[check(s)] += 1
    print("world:", stats)

    random.seed(7)
    pieces = ["<p>", "</p>", "<div class='a'>", '<div class="b" id=x>',
              "</div>", "text", "&amp;", "&#65;", "&notareal;", "&",
              "<", ">", "< notatag", "<!-- comment -->",
              "<!doctype html>", "<?pi data?>", "<br/>", "<img src=x>",
              "<script>var a = '<div>' && 1;</script>",
              "<style>a>b { }</style>", "<SCRIPT>x</SCRIPT>", "</>",
              "</style b >", "</script y>", "</ script>", "</style>",
              "<a href='x&amp;y'>", "</a>", "<b", "<![CDATA[x]]>",
              "<!bogus>", "</ p>", "<p a=1 b=2>", "<p a>",
              "<meta name=k content=v>", "<p/>x</p >", "é", "\n",
              "  ", "<t:ns>", "</t:ns>", "<p =weird>", "<p a=='d'>",
              "<p 'q'>", "a&#xE9;b", "&gt", "&#",
              "<title>T&T</title>", "<td>x</td></tr>"]
    fz = {"ok": 0, "bail": 0, "diverge": 0}
    for _ in range(4000):
        s = "".join(random.choice(pieces)
                    for _ in range(random.randint(1, 30)))
        fz[check(s)] += 1
    print("fuzz:", fz)
    bad = stats["diverge"] + fz["diverge"]
    print("PASS" if bad == 0 else f"FAIL ({bad} divergences)")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
