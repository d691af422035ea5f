"""Publish finished benchmark-matrix runs into BASELINE.json `published`.

Reads eval artifacts from log/<run> dirs + log/matrix_walltime.jsonl and
copies the numbers (chamfer/NC/PCK/wall-clock) into BASELINE.json and
results/.  Idempotent; run after any matrix config completes.

Usage: python exp/publish.py <config>=<logdir> [...]
   e.g. python exp/publish.py syn-dog-15=log/dogf-4 DAVIS-camel=log/camel-5
"""

import json
import os
import shutil
import sys

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    base = json.load(open("BASELINE.json"))
    wall = {}
    if os.path.exists("log/matrix_walltime.jsonl"):
        for line in open("log/matrix_walltime.jsonl"):
            rec = json.loads(line)
            if rec.get("rc") == 0:
                wall[rec["run"]] = rec["wall_s"]

    for arg in sys.argv[1:]:
        cfg, logdir = arg.split("=", 1)
        entry = base["published"].get(cfg, {})
        em = os.path.join(logdir, "eval_mesh.json")
        if os.path.exists(em):
            m = json.load(open(em))
            entry["mean_chamfer"] = round(m["mean_chamfer"], 4)
            entry["mean_normal_consistency"] = round(
                m["mean_normal_consistency"], 4)
            entry["frames"] = m.get("frames")
            shutil.copy(em, f"results/{cfg}_eval_mesh.json")
        eb = os.path.join(logdir, "eval_badja.json")
        if os.path.exists(eb):
            entry["pck"] = round(json.load(open(eb))["pck"], 2)
            shutil.copy(eb, f"results/{cfg}_eval_badja.json")
        candidates = {"syn-dog-15": ["dog15c", "dog15"],
                      "DAVIS-camel": ["camel2", "camel"],
                      "pika-e2e": ["pika2", "pika"],
                      "pika": ["pika2", "pika"],
                      "spot3": ["spot3r3", "spot3"],
                      "spot3-gtcam": ["gtcam"]}.get(cfg, [cfg])
        for key in candidates:
            if key in wall:
                entry["wall_s_total"] = wall[key]
                break
        entry["run_dir"] = logdir
        if entry:
            base["published"][cfg] = entry
            print(f"{cfg}: {entry}")
        else:
            print(f"{cfg}: no artifacts found in {logdir}")

    json.dump(base, open("BASELINE.json", "w"), indent=2)


if __name__ == "__main__":
    main()
