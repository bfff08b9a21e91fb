"""On-chip A/B of PK2_BLOCKFB_DEFERNORM at the block_fb bench config.

VERDICT r4 item 6 (close block-FB with a decision): measure the deferred
[B,Sp]-normalize-into-[B,P]-obs-row variant (ops/fb_block._defernorm)
against the default at the bench shape (96k-state chain graph, B=64,
T=100), then record >=28 utt/s or the closing floor note in BASELINE.md.

Run:  PK2_PLATFORM=tpu python tools/probe_blockfb_defernorm.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    for env in ("0", "1"):
        os.environ["PK2_BLOCKFB_DEFERNORM"] = env
        utts = bench._measure_block_fb()
        print(json.dumps({"defernorm": env, "utt_s": round(utts, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
