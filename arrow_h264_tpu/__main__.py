"""CLI decoder driver (SURVEY.md §2 Config/CLI + Output writer).

Reference parity: JM-lineage `ldecod.c` / `configfile.c` / `output.c`
(reference mount empty — surface modeled on the JM decoder CLI): decode an
Annex-B file to planar YUV 4:2:0, optionally compare against a reference
YUV for conformance checking, print a per-stream summary.

    python -m arrow_h264_tpu decode in.264 out.yuv [--ref golden.yuv]
    python -m arrow_h264_tpu info in.264
"""

from __future__ import annotations

import argparse
import sys
import time

from .api import Decoder
from .bitstream import nal
from .bitstream.params import parse_sps


def _cmd_decode(args: argparse.Namespace) -> int:
    data = open(args.input, "rb").read()
    dec = Decoder(entropy=args.entropy, trace=args.trace,
                  trace_se=args.trace_se)
    n = 0
    w = h = 0
    t0 = time.perf_counter()
    ref = open(args.ref, "rb") if args.ref else None
    mismatches = 0
    sse = [0.0, 0.0, 0.0]       # per-plane, for --psnr (JM-style SNR line)
    npx = [0, 0, 0]
    with open(args.output, "wb") as out:
        for frame in dec.decode_annexb(data):
            buf = frame.planar()
            out.write(buf)
            if ref is not None:
                want = ref.read(len(buf))
                if len(want) != len(buf):
                    print(f"frame {n}: reference truncated "
                          f"({len(want)} of {len(buf)} bytes)",
                          file=sys.stderr)
                    mismatches += 1
                else:
                    if want != buf:
                        diffs = sum(a != b for a, b in zip(buf, want))
                        print(f"frame {n}: {diffs} byte diffs vs {args.ref}",
                              file=sys.stderr)
                        mismatches += 1
                    if args.psnr:
                        import numpy as np
                        a = np.frombuffer(buf, np.uint8).astype(np.int64)
                        b = np.frombuffer(want, np.uint8).astype(np.int64)
                        ny = frame.width * frame.height
                        nc = ny // 4
                        for pl, (o, ln) in enumerate(
                                ((0, ny), (ny, nc), (ny + nc, nc))):
                            d = a[o:o + ln] - b[o:o + ln]
                            sse[pl] += float((d * d).sum())
                            npx[pl] += ln
            n += 1
            w, h = frame.width, frame.height
    dt = time.perf_counter() - t0
    print(f"decoded {n} frames {w}x{h} in {dt:.2f}s ({n / max(dt, 1e-9):.1f}"
          f" fps incl. host entropy + compile)")
    if ref is not None:
        extra = ref.read(1)
        ref.close()
        if args.psnr:
            import math
            vals = []
            for pl, name in enumerate("YUV"):
                if npx[pl] == 0:
                    vals.append("n/a")
                elif sse[pl] == 0:
                    vals.append("inf")
                else:
                    vals.append(f"{10 * math.log10(255 * 255 * npx[pl] / sse[pl]):.2f}")
            print(f"SNR Y {vals[0]} dB  U {vals[1]} dB  V {vals[2]} dB")
        if extra:
            print("reference YUV has more frames than the stream",
                  file=sys.stderr)
            return 1
        if mismatches:
            return 1
        print("bit-exact vs reference YUV")
    return 0


def _cmd_info(args: argparse.Namespace) -> int:
    data = open(args.input, "rb").read()
    counts: dict[int, int] = {}
    for u in nal.parse_annexb(data):
        counts[u.nal_unit_type] = counts.get(u.nal_unit_type, 0) + 1
        if u.nal_unit_type == nal.NAL_SPS:
            s = parse_sps(u.rbsp)
            print(f"SPS {s.seq_parameter_set_id}: profile {s.profile_idc} "
                  f"level {s.level_idc} {s.pic_width_in_mbs * 16}x"
                  f"{s.pic_height_in_map_units * 16} "
                  f"(crop -> {s.width}x{s.height})")
    names = {1: "slice", 5: "IDR", 6: "SEI", 7: "SPS", 8: "PPS", 9: "AUD",
             12: "filler"}
    for t in sorted(counts):
        print(f"  nal type {t} ({names.get(t, '?')}): {counts[t]}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="arrow_h264_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("decode", help="decode Annex-B to planar YUV420")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--ref", help="reference YUV to compare bit-exactly")
    d.add_argument("--psnr", action="store_true",
                   help="with --ref: print per-plane SNR (JM-style)")
    d.add_argument("--entropy", choices=("cpp", "python"), default="cpp")
    d.add_argument("--trace", help="write per-slice/per-MB JSONL decode trace")
    d.add_argument("--trace-se", dest="trace_se",
                   help="write the syntax-element-level entropy trace "
                        "(JM trace_dec.txt analog; forces python entropy)")
    d.set_defaults(fn=_cmd_decode)
    i = sub.add_parser("info", help="print stream structure")
    i.add_argument("input")
    i.set_defaults(fn=_cmd_info)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
