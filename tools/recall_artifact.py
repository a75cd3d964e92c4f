#!/usr/bin/env python3
"""Turn graft.RecallProbe's two-regime JSON line into the committed
RECALL_SF1_r{N}.json artifact, GATING both regimes' contracts
(builder tooling only; r13 verdict item 4):

  - structure_free: the curve must beat the nprobe/nlist fraction line
    at every width and reach 1.0 at full probe (the exact-ride
    identity) — the only measurable claims isotropic data admits;
  - clustered: recall at the SHIPPED nprobe = 3 must be >= 0.9 — the
    regime the fixture spec governs, now gated at artifact scale.

Usage: python3 tools/recall_artifact.py <recallprobe_json_line> <out>
(the input file holds RecallProbe's stdout line, `[info] ` prefix ok)
"""
import json
import sys

CONTRACT = (
    "Two corpus regimes, one artifact (r13 verdict item 4). "
    "STRUCTURE-FREE (the inflated sf1 corpus, near-orthogonal noise - "
    "the documented qAnnIvf regime): IVF recall on isotropic data "
    "cannot beat ~the probed fraction plus the quantizer ordering "
    "gain; the committed evidence is the curve - recall rises "
    "monotonically, beats the nprobe/nlist fraction line at every "
    "width, and reaches 1.0 at nprobe = nlist (the exact-ride "
    "identity). CLUSTERED (ScaleGen clustered mode: 2000 hash-derived "
    "seed directions, bounded angular noise, cluster count >> nlist "
    "so whole clusters share a coarse bucket - the regime the >=0.9 "
    "fixture spec governs): recall at the SHIPPED nprobe = 3 must be "
    ">= 0.9. Both gates are asserted by this script; a regression "
    "fails the artifact build loudly.")


def main():
    raw = open(sys.argv[1]).read().strip()
    if raw.startswith("[info] "):
        raw = raw[len("[info] "):]
    d = json.loads(raw)
    regimes = {c["regime"]: c for c in d["corpora"]}
    sf = regimes["structure_free"]
    for p in sf["curve"]:
        assert p["recall"] >= p["fraction"] - 1e-9, (
            f"structure-free curve fell below the fraction line at "
            f"nprobe={p['nprobe']}: {p['recall']} < {p['fraction']}")
    assert sf["curve"][-1]["recall"] == 1.0, "full probe recall != 1.0"
    cl = regimes["clustered"]
    assert cl["recall_at_shipped_nprobe3"] >= 0.9, (
        f"clustered shipped-nprobe recall gate FAILED: "
        f"{cl['recall_at_shipped_nprobe3']} < 0.9")
    out = {
        "contract": CONTRACT,
        "generator": ("graft.RecallProbe structure_free=tmp/sf1 "
                      "clustered=tmp/sfclustered"),
        "corpora": d["corpora"],
    }
    json.dump(out, open(sys.argv[2], "w"), indent=1)
    print(f"{sys.argv[2]}: structure-free shipped "
          f"{sf['recall_at_shipped_nprobe3']}, clustered shipped "
          f"{cl['recall_at_shipped_nprobe3']} — both gates green")


if __name__ == "__main__":
    main()
