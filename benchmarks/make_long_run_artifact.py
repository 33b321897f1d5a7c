"""Assemble benchmarks/long_run_c2.json from a finished long-run ckpt dir
(VERDICT r3 next #8): config-2-scale bf16 pallas_local stability evidence —
descending loss curve, dev-BLEU trajectory, NaN-free, and a mid-run
kill/--resume boundary that continues the curve.

Usage: python make_long_run_artifact.py <ckpt_dir> <resume_step>
"""

import json
import math
import os
import sys


def main():
    ckpt_dir = sys.argv[1]
    resume_step = int(sys.argv[2])
    train, evals = [], []
    with open(os.path.join(ckpt_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            (train if r.get("kind") == "train" else evals).append(r)
    train.sort(key=lambda r: (r["step"], r["ts"]))
    evals.sort(key=lambda r: (r["step"], r["ts"]))

    losses = [(r["step"], r["loss"]) for r in train]
    assert all(math.isfinite(v) for _, v in losses), "non-finite loss!"

    def at(step):
        return min(losses, key=lambda sv: abs(sv[0] - step))[1]

    # resume continuity: the first post-resume loss should sit on the
    # pre-kill trend, not reset toward the initial loss
    pre = [v for s, v in losses if resume_step - 500 <= s <= resume_step]
    post = [v for s, v in losses if resume_step < s <= resume_step + 500]
    init = losses[0][1]
    continuity_ok = (post and pre
                     and abs(post[0] - pre[-1]) < 0.25 * (init - pre[-1]))

    out = {
        "metric": "long_run_stability_c2_scale",
        "config": ("configs/c2_amr2.json overrides: synthetic 3000 "
                   "instances, 5000 steps, d512 ff1024 8h 4+4 bf16 "
                   "pallas_local, --eval_bleu, kill at step "
                   f"{resume_step} then --resume"),
        "steps": losses[-1][0],
        "loss_curve": {str(s): round(at(s), 4)
                       for s in (50, 500, 1000, 2000, resume_step,
                                 resume_step + 500, 4000, 5000)},
        "dev": [{"step": r["step"], "dev_ppl": round(r["dev_ppl"], 3),
                 "dev_bleu": round(r.get("dev_bleu", float("nan")), 2)}
                for r in evals],
        "no_nan": True,
        "resume_step": resume_step,
        "resume_continuity_ok": bool(continuity_ok),
        "note": ("synthetic corpus (no LDC data in this image — "
                 "BASELINE.md 'Metric availability'); the artifact "
                 "demonstrates optimizer/kernel/ckpt stability at "
                 "reference scale, not corpus BLEU parity"),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "long_run_c2.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
