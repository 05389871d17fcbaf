"""One-process round-3 device validation: pays the relay warmup once and
runs (a) the int8kv decode A/B, (b) the Mosaic int4-unpack probe, and
(c) the WaveNet conv-lowering probe back to back.

Run from /root/repo: timeout 5400 python tools/device_checklist_r3.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main():
    import bench_decode_int4
    import bench_decode_int8kv
    import probe_mosaic_int4
    import probe_wavenet_conv

    print("=== int8kv decode A/B ===", flush=True)
    bench_decode_int8kv.main()
    print("=== int4 weights decode A/B ===", flush=True)
    try:
        bench_decode_int4.main()
    except Exception as e:
        print(f"int4 decode A/B died: {e}", flush=True)
    print("=== mosaic int4 unpack probe ===", flush=True)
    try:
        probe_mosaic_int4.main()
    except Exception as e:
        print(f"int4 probe died: {e}", flush=True)
    print("=== wavenet conv probe ===", flush=True)
    try:
        probe_wavenet_conv.main()
    except Exception as e:
        print(f"wavenet probe died: {e}", flush=True)


if __name__ == "__main__":
    main()
