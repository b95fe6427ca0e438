#!/usr/bin/env python3
"""Golden-fixture generator: runs the REFERENCE implementation
(/root/reference: slicer.py, quality.py, template.py — pure pandas/stdlib
functions, executed read-only with no side effects) on a deterministic battery
of synthetic inputs and dumps inputs + expected outputs as JSON.

The Scala kernel test suite (graft.kernel.GoldenParitySpec) replays the same
inputs and asserts identical outputs — true cross-implementation parity, not
self-consistency. Dev-side tool only; never shipped nor imported by the
engine."""

import json
import random
import sys

sys.path.insert(0, "/root/reference")
import logging
logging.disable(logging.CRITICAL)

from slicer import TableSlicer  # noqa: E402
from quality import QualityChecker  # noqa: E402
from template import TemplateManager  # noqa: E402
from difflib import SequenceMatcher, get_close_matches  # noqa: E402

rng = random.Random(20250816)

TEMPLATES = {
    "test": ([50, 100, 500, 400], [50, 200, 350, 500]),
    "sysco": ([260, 652, 4300, 2844],
              [260, 292, 568, 708, 904, 2392, 2676, 2912, 3136, 3464, 4300]),
    "newark": ([35, 290, 1609, 1099],
               [35, 130, 217, 300, 379, 464, 598, 766, 857, 935, 1040,
                1165, 1244, 1331, 1418, 1524, 1609]),
}

VOCAB = ["189934", "FR1018", "DRY3227", "MAIDRITE", "$171.74", "9/10/2025",
         "75156-033301", "160CT 3OZ BURGER", "72 per case 1 meal",
         "E S Food", "Breakfast Break", "2 oz gr equ , 1/2 c fruit",
         "serving incl bowlpack,", "General Mills, 96 - 1", "O'Lakes",
         "Page 1 of 241", "GENERAL", "  padded  ", "a  b   c", "x\ty",
         "single", "12", "0", "$5", "AB-12", "Z9-K7", "1/2/99", "", " ",
         "word1 word2 word3 word4 word5", "Land", "Right Start"]


def rand_items(n, box, big=False):
    x1, y1, x2, y2 = box
    items = []
    for _ in range(n):
        # mostly inside the box, some outside
        inside = rng.random() < 0.8
        if inside:
            x = rng.randint(x1, max(x1, x2 - 60))
            y = rng.randint(y1, max(y1, y2 - 20))
        else:
            x = rng.randint(0, x2 + 200)
            y = rng.choice([rng.randint(0, max(1, y1 - 10)),
                            rng.randint(y2 + 1, y2 + 300)])
        w = rng.choice([0, 20, 40, 60, 90, 140, 200, 320])
        h = rng.choice([10, 12, 14, 16])
        items.append({
            "text": rng.choice(VOCAB),
            "page": 1 if rng.random() < 0.95 else 2,
            "x": x, "y": y, "width": w, "height": h,
            "confidence": rng.randint(30, 100),
        })
    return items


cases = []
for case_id in range(60):
    tname = rng.choice(list(TEMPLATES))
    box, cols = TEMPLATES[tname]
    n = rng.choice([0, 1, 3, 8, 25, 60, 150])
    items = rand_items(n, box)
    page = rng.choice([None, 1, 2])
    slicer = TableSlicer(row_threshold=20)
    try:
        df = slicer.slice_to_table(items, box, cols, page=page)
    except ZeroDivisionError:
        # all-zero-width row: the reference raises (slicer.py:169); the engine
        # must mirror this as a per-document failure.
        cases.append({"template": tname, "page": page, "items": items,
                      "grid": None, "quality": None, "error": "ZeroDivisionError"})
        continue
    grid = [[("" if c is None else str(c)) for c in row] for row in df.values.tolist()]
    checker = QualityChecker()
    rep = checker.check_extraction(df, items, None)
    cases.append({
        "template": tname, "page": page, "items": items, "grid": grid,
        "quality": {
            "empty_ratio": rep.empty_ratio,
            "confidence_avg": rep.confidence_avg,
            "row_consistency": rep.row_consistency,
            "column_alignment": rep.column_alignment,
            "text_coverage": rep.text_coverage,
            "overall_score": rep.overall_score,
            "column_types": rep.column_types,
            "warnings": rep.warnings,
        },
    })

# splittable classifier battery
slicer = TableSlicer()
splittable = {t: slicer._is_splittable_text(t) for t in VOCAB if t}

# adaptive threshold battery
thresholds = []
for _ in range(20):
    n = rng.randint(0, 40)
    ys = [rng.randint(0, 1200) for _ in range(n)]
    items = [{"text": "t", "page": 1, "x": 0, "y": y, "width": 10,
              "height": 10, "confidence": 90} for y in ys]
    s = TableSlicer(row_threshold=20)
    thresholds.append({"ys": ys, "threshold": s._get_adaptive_row_threshold(items)})

# sequence-matcher ratio battery
pairs = []
words = ["newark", "newmark", "newark ", "sysco", "cisco", "sysc0", "test",
         "tset", "walmart", "walmrat", "abc", "abd", "", "a", "aa", "ab",
         "general mills", "generall milss"]
for a in words:
    for b in words:
        pairs.append({"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()})

close = []
for w in ["newark ", "newmark", "sisco", "walmart", "tes", "xyz", "sysco inc"]:
    close.append({"word": w,
                  "matches": get_close_matches(w, sorted(TEMPLATES.keys()), n=1, cutoff=0.8)})

# vendor detection battery (uses TemplateManager.detect_vendor defaults)
tm = TemplateManager.__new__(TemplateManager)
tm.templates = {}
vendor_cases = []
texts = [
    ["Amazon", "order", "aws", "billing"],
    ["google cloud platform", "gcp", "invoice"],
    ["microsoft", "azure", "azure", "msft"],
    ["WALMART", "Walmart", "store"],
    ["nothing", "matches", "here"],
    ["apple amazon apple", "mixed"],
    ["amazon google", "tie maybe", "amazon google"],
]
for t in texts:
    items = [{"text": x, "x": 0, "y": i * 10, "width": 10, "height": 10}
             for i, x in enumerate(t)]
    vendor_cases.append({"texts": t, "vendor": tm.detect_vendor(items)})

# CSV-sink parity battery (table_slicer.py:159-162 fallback:
# df.to_csv(path, index=False, header=False) — pandas itself renders the
# expected strings; graft.kernel.Csv must match byte-for-byte)
import pandas as pd  # noqa: E402 (the reference's own dependency)
csv_tricky = [
    [],
    [[]],
    [[""]],
    [["a"]],
    [["", ""]],
    [["\r"]],
    [[" lead", "trail "]],
    [["has,comma", 'has"quote', "has\nnewline"], ["has\rcr", "plain", ""]],
    [['"', '""', ',', '\n'], ['a,b"c\nd', "", "x,\"y\"\nz"]],
    [["naïve café — em–dash", "€171.74", "12\t13"]],
    [["", "", ""], ["", "x", ""]],
    [["a"], []],
    [["a"], ["b", "c"], ["d", "e", "f"]],
    [["O'Lakes", "$171.74", "9/10/2025"], ["160CT 3OZ BURGER", "72 per case", "E S Food"]],
]
csv_cases = [{"grid": g,
              "csv": pd.DataFrame(g).to_csv(index=False, header=False)}
             for g in csv_tricky]
# every slicer-produced grid, rendered by pandas (the real sink input shape)
for c in cases:
    if c["grid"]:
        csv_cases.append({"grid": c["grid"],
                          "csv": pd.DataFrame(c["grid"]).to_csv(index=False, header=False)})

out = {
    "slice_cases": cases,
    "csv_cases": csv_cases,
    "splittable": splittable,
    "thresholds": thresholds,
    "ratio_pairs": pairs,
    "close_matches": close,
    "vendor_cases": vendor_cases,
}
with open("/root/repo/src/test/resources/golden_kernel.json", "w") as f:
    json.dump(out, f)
print(f"cases={len(cases)} thresholds={len(thresholds)} pairs={len(pairs)}")
