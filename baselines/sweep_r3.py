"""Round-3 TPU validation sweep (final select+partition kernel).

- TCGA / CMU: the unpruned cost model's top picks vs the round-2
  measured optima (VERDICT item 6: no hand-pruned candidates —
  validate the model's ranking by measurement).
- EAO: grouped equal-length channel passes vs sequential (item 4).
- zorro: regression point.

Appends JSON lines to baselines/sweep_r3_results.jsonl.
Usage: python baselines/sweep_r3.py [tcga|cmu|eao|zorro|all]
"""
import json, os, subprocess, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "baselines", "sweep_r3_results.jsonl")


def run(tag, env_over, out=OUT):
    env = dict(os.environ); env.update({k: str(v) for k, v in env_over.items()})
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    line = None
    for ln in p.stdout.splitlines():
        if ln.strip().startswith("{"): line = ln.strip()
    rec = {"tag": tag, "env": env_over, "wall_s": round(time.time()-t0, 1)}
    if line: rec.update(json.loads(line))
    else: rec["error"] = (p.stderr or "")[-1500:]
    with open(out, "a") as f: f.write(json.dumps(rec) + "\n")
    print(tag, "->", rec.get("value"), rec.get("step_time_ms"), flush=True)


def blocks(bq, bk):
    return {"MCA_FLASH_BLOCK_Q": bq, "MCA_FLASH_BLOCK_K": bk}


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("tcga", "all"):
        for bq, bk in [(384, 896), (640, 896), (320, 896), (512, 896)]:
            run(f"tcga/{bq}x{bk}", blocks(bq, bk))
    if part in ("cmu", "all"):
        for bq, bk in [(640, 768), (640, 512), (640, 896), (512, 1280)]:
            run(f"cmu/{bq}x{bk}", dict(blocks(bq, bk), BENCH_DATASET="cmu"))
    if part in ("eao", "all"):
        run("eao/grouped", {"BENCH_VARIANT": "eao"})
        run("eao/sequential", {"BENCH_VARIANT": "eao", "BENCH_EAO_GROUP": 0})
    if part in ("zorro", "all"):
        run("zorro/auto", {"BENCH_VARIANT": "zorro"})


if __name__ == "__main__":
    main()
