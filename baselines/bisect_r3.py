"""Bisect the round-3 kernel regression: cond-skip vs custom_partitioning.

Four bench runs at TCGA auto blocks:
  base      : skip on,  partition on   (current default)
  noskip    : skip off, partition on
  nopart    : skip on,  partition off
  neither   : skip off, partition off  (round-2 equivalent kernel)
"""
import json, os, subprocess, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "baselines", "bisect_r3_results.jsonl")

def run(tag, env_over):
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
    with open(OUT, "a") as f: f.write(json.dumps(rec) + "\n")
    print(tag, "->", rec.get("value"), rec.get("step_time_ms"), flush=True)

run("base", {})
run("noskip", {"MCA_FLASH_SKIP": 0})
run("nopart", {"MCA_FLASH_NO_PARTITION": 1})
run("neither", {"MCA_FLASH_SKIP": 0, "MCA_FLASH_NO_PARTITION": 1})
