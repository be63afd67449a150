"""One-shot refactoring script: split the monolithic harness.py into a
harness/ package of per-family modules (VERDICT r6 #7).

Mechanics, no behavior change: every top-level segment (function / constant,
with its leading comments) is assigned to a family module — registered
queries by query-name prefix, helpers to the single family that references
them (shared helpers go to _core) — keeping original relative order inside
each module so query↔oracle adjacency survives. __init__ imports families
in an order that satisfies every cross-module reference and re-exports all
top-level names (including underscore helpers bench/tools import).

    python tools/split_harness.py [--write]
"""

from __future__ import annotations

import ast
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "whatsapp_vectordb_spark", "harness.py")
OUT = os.path.join(REPO, "whatsapp_vectordb_spark", "harness")

FAMILY_OF_PREFIX = {
    "parse": "engine", "compat": "engine", "index": "engine", "upsert": "engine",
    "point": "engine", "embed": "engine", "vector": "engine",
    "knn": "ann", "ann": "ann", "cluster": "ann", "embeddings": "ann", "hybrid": "ann",
    "dedup": "dedup", "minhash": "dedup", "simhash": "dedup",
    "text": "text",
    "rel": "rel", "customer": "rel",
    "events": "events", "graph": "events",
    "multimodal": "multimodal",
    "curate": "curate", "pipeline": "curate", "pack": "curate",
    "sample": "curate", "docs": "curate",
    "streaming": "streaming",
}
MODULE_ORDER = [
    "_core", "engine", "ann", "dedup", "text", "rel",
    "events", "multimodal", "curate", "streaming",
]

HEADER_DOC = {
    "engine": "Engine-surface queries: parse/compat/index/upsert/point-fetch/embed.",
    "ann": "kNN / ANN / clustering queries.",
    "dedup": "Exact and near-dedup queries.",
    "text": "Text-analysis and retrieval queries.",
    "rel": "Relational (TPC-H-shaped) queries.",
    "events": "Event/session/graph queries.",
    "multimodal": "Multimodal (binary media) queries.",
    "curate": "Corpus-curation / sampling / packing queries.",
    "streaming": "Structured Streaming twin queries.",
}


def main() -> None:
    write = "--write" in sys.argv
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # --- segments: each top-level stmt + its leading comments/blank lines
    segs = []
    prev_end = 0
    header_end = None
    for node in tree.body:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        seg_start = prev_end  # 0-based: right after the previous node
        seg = {
            "node": node,
            "text": "".join(lines[seg_start : node.end_lineno]),
            "defines": set(),
            "refs": set(),
            "family": None,
            "qname": None,
        }
        prev_end = node.end_lineno
        if isinstance(node, ast.FunctionDef):
            seg["defines"].add(node.name)
            for d in node.decorator_list:
                if (
                    isinstance(d, ast.Call)
                    and getattr(d.func, "id", "") == "_register"
                    and isinstance(d.args[0], ast.Constant)
                ):
                    seg["qname"] = d.args[0].value
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for sub in ast.walk(t):
                    if isinstance(sub, ast.Name):
                        seg["defines"].add(sub.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            seg["defines"].add(node.target.id)
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name):
                seg["refs"].add(sub.id)
        segs.append(seg)

    # --- the prelude (docstring, imports, registry dicts, _register, and
    # the canonical shared helpers) stays in _core wholesale: everything up
    # to and including the last of the known prelude defs
    PRELUDE = {"QUERIES", "ORACLES", "_register", "_t", "_oracle_scratch",
               "_tmp_scratch", "ROUND_SCORE"}
    last_prelude = max(
        i for i, s in enumerate(segs) if s["defines"] & PRELUDE or
        isinstance(s["node"], (ast.Import, ast.ImportFrom, ast.Expr))
        and i < 30
    )
    for i, s in enumerate(segs):
        if i <= last_prelude:
            s["family"] = "_core"
        elif s["qname"]:
            fam = FAMILY_OF_PREFIX.get(s["qname"].split("_")[0])
            if fam is None:
                raise SystemExit(f"no family for query {s['qname']}")
            s["family"] = fam

    # --- propagate helper segments to the single family that uses them
    def_site = {}
    for i, s in enumerate(segs):
        for n in s["defines"]:
            if n in def_site:
                raise SystemExit(f"duplicate top-level name {n}")
            def_site[n] = i
    # users[j] = set of segment indices referencing something j defines
    users = defaultdict(set)
    for i, s in enumerate(segs):
        for r in s["refs"]:
            j = def_site.get(r)
            if j is not None and j != i:
                users[j].add(i)

    changed = True
    while changed:
        changed = False
        for j, s in enumerate(segs):
            if s["family"] is not None:
                continue
            fams = {segs[i]["family"] for i in users[j]}
            if None in fams:
                continue  # wait for users to settle
            fams.discard("_core")
            if len(fams) == 1:
                s["family"] = fams.pop()
                changed = True
            elif len(fams) == 0 and users[j] and all(
                segs[i]["family"] == "_core" for i in users[j]
            ):
                s["family"] = "_core"
                changed = True
    for s in segs:
        if s["family"] is None:
            s["family"] = "_core"

    # --- hazard check: references must respect module import order
    order = {m: k for k, m in enumerate(MODULE_ORDER)}
    problems = []
    for i, s in enumerate(segs):
        for r in s["refs"]:
            j = def_site.get(r)
            if j is None or j == i:
                continue
            fs, fj = s["family"], segs[j]["family"]
            if fs != fj and order[fj] > order[fs]:
                problems.append(f"{fs} uses {r} from later module {fj}")
    if problems:
        for p in sorted(set(problems)):
            print("HAZARD:", p)
        raise SystemExit("ordering hazards — adjust MODULE_ORDER or families")

    # --- emit
    import_block = "".join(lines[segs[0]["node"].end_lineno : segs[last_prelude]["node"].lineno - 1])
    # import_block heuristic is fragile; instead reuse verbatim known imports:
    import_block = (
        "from __future__ import annotations\n\n"
        "import os\n"
        "from collections.abc import Callable\n\n"
        "from pyspark.sql import DataFrame, SparkSession, Window\n"
        "from pyspark.sql import functions as F\n\n"
        "from whatsapp_vectordb_spark.functions.vector import (\n"
        "    cosine_similarity,\n    dot_product,\n    euclidean_distance,\n    l2_norm,\n)\n"
        "from whatsapp_vectordb_spark.operators.search import topk, topk_batched\n"
    )

    mod_segs = {m: [i for i, s in enumerate(segs) if s["family"] == m] for m in MODULE_ORDER}
    mod_defs = {m: sorted({n for i in mod_segs[m] for n in segs[i]["defines"]}) for m in MODULE_ORDER}

    files = {}
    core_body = "".join(segs[i]["text"] for i in mod_segs["_core"])
    files["_core.py"] = core_body
    for m in MODULE_ORDER[1:]:
        needed = defaultdict(set)
        for i in mod_segs[m]:
            for r in segs[i]["refs"]:
                j = def_site.get(r)
                if j is not None and segs[j]["family"] not in (m,):
                    needed[segs[j]["family"]].add(r)
        imp = [f'"""{HEADER_DOC[m]}\n\nSplit out of the monolithic harness.py (registration order preserved\nwithin each family; see harness/__init__.py for the module order).\n"""\n']
        imp.append(import_block)
        for g in MODULE_ORDER:
            if g in needed:
                names = ", ".join(sorted(needed[g]))
                imp.append(f"\nfrom whatsapp_vectordb_spark.harness.{g.lstrip('.')} import {names}  # noqa: E501\n")
        files[f"{m}.py"] = "".join(imp) + "\n" + "".join(segs[i]["text"] for i in mod_segs[m])

    init = [
        '"""Driver-contract query registry (package form of the original\n'
        "harness.py): per-family modules registering into the shared\n"
        "QUERIES/ORACLES dicts in _core. Import order below determines\n"
        "registration order; every top-level name (public and underscore\n"
        "helpers used by bench/tools/tests) is re-exported so\n"
        "``from whatsapp_vectordb_spark.harness import X`` keeps working.\n"
        '"""\n\n'
    ]
    for m in MODULE_ORDER:
        names = ", ".join(mod_defs[m])
        modname = m
        if names:
            init.append(f"from whatsapp_vectordb_spark.harness.{modname} import (  # noqa: F401,E501\n")
            for n in mod_defs[m]:
                init.append(f"    {n},\n")
            init.append(")\n")
    files["__init__.py"] = "".join(init)

    for m in MODULE_ORDER + ["__init__"]:
        fn = f"{m}.py" if not m.endswith(".py") else m
        fn = fn if fn in files else f"{m}.py"
    print({k: len(v.splitlines()) for k, v in files.items()})
    if write:
        os.makedirs(OUT, exist_ok=True)
        for fn, body in files.items():
            with open(os.path.join(OUT, fn), "w") as f:
                f.write(body)
        os.remove(SRC)
        print("wrote", OUT, "and removed harness.py")


if __name__ == "__main__":
    main()
