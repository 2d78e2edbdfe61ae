#!/usr/bin/env python3
"""Print half 1|2 of graft.Bench.headline (minus dedup_simhash, which
is benched from fresh-JVM solos per the r12 methodology), comma- or
space-joined — the sf1 exec-cap split used by the round artifacts.

  usage: split_headline.py 1|2 [sep]
"""
import re
import sys
from pathlib import Path

src = (Path(__file__).resolve().parent.parent /
       "src/main/scala/graft/Bench.scala").read_text()
block = src[src.index("val headline"):src.index("def main")]
names = [n for n in re.findall(r'"([a-z0-9_]+)"', block)
         if n != "dedup_simhash"]
half = (len(names) + 1) // 2
pick = names[:half] if sys.argv[1] == "1" else names[half:]
sep = sys.argv[2] if len(sys.argv) > 2 else ","
print(sep.join(pick))
