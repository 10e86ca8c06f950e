"""Feature-coverage probe: encode real aom streams with one feature at a
time, decode with oracle + dav1d_tpu, report PASS/MISMATCH/exception.
Development tool for prioritizing decoder work (not a test)."""
import subprocess
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from aom_enc import AomEncoder, write_ivf_packets, gradient_frames  # noqa
from dav1d_tpu.decoder import Decoder  # noqa
from dav1d_tpu.containers import read_ivf  # noqa

ORACLE = "/tmp/dav1d-ref/dav1d"

OFF_ALL = {
    "enable-palette": 0, "enable-intrabc": 0, "enable-restoration": 0,
    "enable-obmc": 0, "enable-warped-motion": 0, "enable-global-motion": 0,
    "enable-ref-frame-mvs": 0, "enable-masked-comp": 0,
    "enable-interintra-comp": 0, "enable-smooth-interintra": 0,
    "enable-dist-wtd-comp": 0, "enable-diff-wtd-comp": 0,
    "enable-dual-filter": 0, "enable-order-hint": 0,
    "reduced-reference-set": 1,
}


def run_case(name, frames, encargs, n_expect=None):
    try:
        enc = AomEncoder(**encargs)
        pkts = enc.encode(frames)
        enc.close()
        ivf = f"/tmp/probe_{name}.ivf"
        write_ivf_packets(ivf, pkts, encargs["width"], encargs["height"])
        y4m = f"/tmp/probe_{name}.y4m"
        r = subprocess.run([ORACLE, "-i", ivf, "-o", y4m, "-q"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            return f"ORACLE-REJECT {r.stderr.strip()[:80]}"
        raw = open(y4m, "rb").read()
        refs = raw.split(b"FRAME\n")[1:]
        dec = Decoder()
        pics = []
        for tu, _ in read_ivf(open(ivf, "rb").read()):
            dec.send_data(tu)
            while (pic := dec.get_picture()) is not None:
                pics.append(pic)
        if len(pics) != len(refs):
            return f"COUNT {len(pics)} vs {len(refs)}"
        npl = 1 if encargs.get("monochrome") else 3
        for i, (pic, fr) in enumerate(zip(pics, refs)):
            got = b"".join(pic.plane_bytes(pl) for pl in range(npl))
            if got != fr:
                j = next(k for k in range(len(got)) if got[k] != fr[k])
                return f"MISMATCH frame {i} at byte {j}"
        return "PASS"
    except NotImplementedError as e:
        return f"NOTIMPL: {e}"
    except Exception as e:
        if "-v" in sys.argv:
            traceback.print_exc()
        return f"EXC: {type(e).__name__}: {str(e)[:90]}"


def main():
    W, H = 128, 96
    fr8 = gradient_frames(6, W, H)
    base = dict(width=W, height=H, usage="good", cpu_used=4, q=40,
                kf_max_dist=9999, lag=0, options=dict(OFF_ALL))

    def opts(**kw):
        d = dict(base)
        d["options"] = {**OFF_ALL, **{k.replace("_", "-"): v
                                      for k, v in kw.items()}}
        return d

    only = sys.argv[1:] if len(sys.argv) > 1 and sys.argv[1] != "-v" else None
    cases = []

    def case(name, frames, args):
        if only and name not in only:
            return
        cases.append((name, frames, args))

    case("intra_only", fr8[:3], {**base, "kf_max_dist": 1})
    case("inter_base", fr8, base)
    case("odd_size", gradient_frames(3, 154, 98),
         {**base, "width": 154, "height": 98})
    case("order_hint", fr8, opts(enable_order_hint=1))
    case("bidir", gradient_frames(10, W, H),
         {**opts(enable_order_hint=1), "lag": 8})
    case("bidir_tmvs", gradient_frames(10, W, H),
         {**opts(enable_order_hint=1, enable_ref_frame_mvs=1), "lag": 8})
    case("bidir_full", gradient_frames(12, W, H),
         {**opts(enable_order_hint=1, enable_ref_frame_mvs=1,
                 enable_masked_comp=1, enable_diff_wtd_comp=1,
                 enable_dist_wtd_comp=1, enable_interintra_comp=1,
                 enable_smooth_interintra=1, enable_dual_filter=1),
          "lag": 8, "cpu_used": 2})
    case("ref_frame_mvs", fr8,
         opts(enable_order_hint=1, enable_ref_frame_mvs=1))
    case("full_refset", fr8, opts(**{"reduced-reference-set": 0}))
    case("dual_filter", fr8, opts(enable_dual_filter=1))
    case("global_motion", fr8, opts(enable_global_motion=1))
    case("obmc", fr8, opts(enable_obmc=1))
    case("warped", fr8, opts(enable_warped_motion=1))
    case("masked_comp", fr8, opts(enable_order_hint=1, enable_masked_comp=1,
                                  enable_diff_wtd_comp=1))
    case("dist_wtd", fr8, opts(enable_order_hint=1, enable_dist_wtd_comp=1))
    case("interintra", fr8, opts(enable_interintra_comp=1,
                                 enable_smooth_interintra=1))
    case("kitchen_sink", gradient_frames(14, W, H),
         {**opts(enable_order_hint=1, enable_ref_frame_mvs=1,
                 enable_masked_comp=1, enable_diff_wtd_comp=1,
                 enable_dist_wtd_comp=1, enable_interintra_comp=1,
                 enable_smooth_interintra=1, enable_dual_filter=1,
                 enable_obmc=1, enable_warped_motion=1,
                 enable_global_motion=1),
          "lag": 8, "cpu_used": 0, "q": 50})
    case("restoration", fr8, opts(enable_restoration=1))
    case("palette", gradient_frames(3, W, H, noise=0),
         {**opts(enable_palette=1, tune_content="screen"), "kf_max_dist": 1})
    case("intrabc", gradient_frames(3, W, H, noise=0),
         {**opts(enable_intrabc=1, tune_content="screen"), "kf_max_dist": 1})
    case("screen_all", gradient_frames(4, W, H, noise=0),
         opts(enable_palette=1, enable_intrabc=1, tune_content="screen"))
    case("superres", fr8, {**base, "superres": (1, 16, 16, 63, 63)})
    case("mono", gradient_frames(3, W, H, monochrome=True),
         {**base, "monochrome": True})
    case("422", gradient_frames(3, W, H, fmt="422"), {**base, "fmt": "422"})
    case("444", gradient_frames(3, W, H, fmt="444"), {**base, "fmt": "444"})
    case("10bit", gradient_frames(3, W, H, bitdepth=10),
         {**base, "bitdepth": 10})
    case("12bit", gradient_frames(3, W, H, bitdepth=12),
         {**base, "bitdepth": 12})
    case("tiles", gradient_frames(3, 256, 128),
         {**opts(tile_columns=1, tile_rows=1), "width": 256, "height": 128})
    case("grain", fr8[:3], {**base, "kf_max_dist": 1,
                            "options": {**OFF_ALL,
                                        "denoise-noise-level": 10}})
    case("cdf_upd_off", fr8, opts(disable_frame_end_update_cdf=1))
    case("sb64", fr8, opts(sb_size=64))
    case("realtime", fr8, {**base, "usage": "realtime", "cpu_used": 7})
    case("allintra", fr8[:3], {**base, "usage": "allintra",
                               "kf_max_dist": 1})

    for name, frames, args in cases:
        res = run_case(name, frames, args)
        print(f"{name:16s} {res}", flush=True)


if __name__ == "__main__":
    main()
