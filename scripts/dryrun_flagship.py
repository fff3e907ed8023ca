"""Run the flagship-shape multi-chip dryrun and capture the artifact.

Usage: python scripts/dryrun_flagship.py [n_devices] [out.json]

Runs __graft_entry__.dryrun_multichip_flagship on an n-device virtual CPU
mesh (re-exec'd subprocess, axon hook stripped) and writes the printed
result dict to the artifact file (default MULTICHIP_FLAGSHIP_r04.json).
"""

import json
import os
import subprocess
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "MULTICHIP_FLAGSHIP_r04.json")
    import __graft_entry__ as g

    env, _ = g._dryrun_subprocess_env(n)
    code = (
        "import __graft_entry__; "
        f"__graft_entry__.dryrun_multichip_flagship({n})"
    )
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=here,
        capture_output=True, text=True,
    )
    record = {
        "n": n,
        "rc": res.returncode,
        "wall_s": round(time.time() - t0, 1),
        "ok": False,
    }
    marker = "dryrun_multichip_flagship ok: "
    for line in (res.stdout or "").splitlines():
        if line.startswith(marker):
            record["ok"] = True
            record["result"] = json.loads(line[len(marker):])
    if not record["ok"]:
        record["tail"] = "\n".join(
            ((res.stderr or "") + (res.stdout or "")).splitlines()[-20:])
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()
