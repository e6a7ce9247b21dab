"""Combine convergence_driver --save dumps into the archived receipt
format (results/convergence_differential*.json + .png) via the test
module's own _archive, and report the deltas the test asserts on.

    python benchmarks/convergence_combine.py /root/convsaves
"""

import glob
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    save_dir = sys.argv[1]
    import test_convergence_differential as conv

    by_type = {}
    for path in sorted(glob.glob(os.path.join(save_dir, "*.json"))):
        d = json.load(open(path))
        by_type.setdefault(d["type"], {})[f"seed{d['seed']}"] = {
            "curves": d["curves"],
            "final": d["final"],
        }

    for att_type, results in by_type.items():
        run = conv.RUNS[att_type]
        want_seeds = {f"seed{s}" for s in run["seeds"]}
        have = set(results)
        if not want_seeds <= have:
            print(f"{att_type}: missing seeds {want_seeds - have}; skipping")
            continue
        conv._archive({k: results[k] for k in sorted(want_seeds)}, att_type, run)
        for seed_name in sorted(want_seeds):
            final = results[seed_name]["final"]
            dv = abs(final["ours"]["val_verb_top1"] - final["torch"]["val_verb_top1"])
            dn = abs(final["ours"]["val_noun_top1"] - final["torch"]["val_noun_top1"])
            dl = abs(final["ours"]["val_loss"] - final["torch"]["val_loss"])
            print(
                json.dumps(
                    {
                        "type": att_type,
                        "seed": seed_name,
                        "torch": final["torch"],
                        "ours": final["ours"],
                        "dv": round(dv, 4),
                        "dn": round(dn, 4),
                        "dl": round(dl, 4),
                    }
                )
            )
        print(f"archived results/convergence_differential"
              f"{'' if att_type == 'mha' else '_' + att_type}.json")


if __name__ == "__main__":
    main()
