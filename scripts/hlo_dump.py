"""Dump the compiled flagship batch-runner HLO and summarize big ops.

    python scripts/hlo_dump.py [batch] [n_scans]

Prints every fusion/op whose output exceeds ~1 MB with its source line,
to attribute profile entries that blame the lax.scan line itself.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main(batch=16, n_scans=20):
    import jax

    from mmloam_tpu import replay
    from mmloam_tpu.config import LIOConfig
    from flagship_bench import build_inputs

    cfg = LIOConfig()
    batch_state, batch_scans = build_inputs(batch, n_scans, cfg,
                                            cache_tag="v1")

    use_pallas = jax.default_backend() != "cpu"
    key = (cfg, None, use_pallas)
    replay.replay_batch(batch_state, batch_scans, cfg)  # build runner
    run = replay._BATCH_RUNNERS[key]
    lowered = run.lower(batch_state, batch_scans)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/flagship_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO written: {len(txt)} chars")

    # summarize: per-op output bytes by (opcode, source line)
    pat = re.compile(
        r"^\s*(?:ROOT )?%?[\w.-]+ = (\S+?) (\w[\w-]*)\(.*?"
        r'(?:metadata=\{.*?source_file="([^"]*)".*?source_line=(\d+))?',
    )

    def shape_bytes(s):
        tot = 0
        for m in re.finditer(r"(f32|s32|u32|bf16|f16|s8|u8|pred|s64)\[([\d,]*)\]", s):
            dt, dims = m.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sz = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                  "s8": 1, "u8": 1, "pred": 1, "s64": 8}[dt]
            tot += n * sz
        return tot

    rows = []
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        shape, opcode, sfile, sline = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        b = shape_bytes(shape)
        if b >= 1 << 20:
            src = f"{(sfile or '?').split('/')[-1]}:{sline}" if sfile else "?"
            rows.append((b, opcode, src, line.strip()[:130]))
    rows.sort(reverse=True)
    print(f"{len(rows)} ops with >=1MB output")
    for b, opcode, src, l in rows[:60]:
        print(f"{b/2**20:9.1f} MB  {opcode:28s} {src:28s} {l[:90]}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
