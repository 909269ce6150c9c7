"""Command-line driver.

Replaces the reference's hardcoded-path main()s (ref 图像融合.cpp:31-34,
特征点检测.cpp:1027-1029) with a proper CLI:

    python -m imagestitch_tpu.cli stitch img1.png img2.png ... -o pano.png
    python -m imagestitch_tpu.cli demo -o pano.png       # synthetic scene
    python -m imagestitch_tpu.cli bench --size 1080p

Stage timings are printed as a metrics dict (the structured replacement for
the reference's clock() stdout prints, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_config(args) -> "PipelineConfig":
    from imagestitch_tpu.config import (
        PipelineConfig, WarpConfig, SeamConfig, BlendConfig, ExposureConfig,
        CameraConfig)
    cfg = PipelineConfig()
    return cfg.replace(
        mode=args.mode,
        warp=WarpConfig(kind=args.warp),
        seam=SeamConfig(kind=args.seam,
                        full_components=args.full_seam_components,
                        seam_megapix=args.seam_megapix),
        blend=BlendConfig(kind=args.blend),
        exposure=ExposureConfig(kind=args.exposure),
        camera=CameraConfig(ba_kind=args.ba),
        work_megapix=args.work_megapix,
        compose_megapix=args.compose_megapix,
        crop=args.crop,
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="imagestitch_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("stitch", help="stitch image files into a panorama")
    ps.add_argument("images", nargs="+")
    ps.add_argument("-o", "--output", default="pano.png")
    pd = sub.add_parser("demo", help="stitch a synthetic 2-image scene")
    pd.add_argument("-o", "--output", default="pano.png")
    pd.add_argument("--size", default="480x640")

    for q in (ps, pd):
        q.add_argument("--mode", default="panorama",
                       choices=["panorama", "scans"],
                       help="panorama: the reference's rotation model; "
                            "scans: affine model (cv2.Stitcher SCANS — "
                            "flatbed/drone scans, no perspective)")
        q.add_argument("--warp", default="cylindrical",
                       choices=["cylindrical", "spherical", "plane",
                                "fisheye", "stereographic"])
        q.add_argument("--seam", default="dp_color",
                       choices=["dp_color", "dp_colorgrad", "voronoi",
                                "graphcut",
                                "graphcut_colorgrad", "none"])
        q.add_argument("--blend", default="feather",
                       choices=["feather", "multiband", "ramp", "none"])
        q.add_argument("--exposure", default="gain",
                       choices=["gain", "gain_blocks", "channels",
                                "channels_blocks", "none"])
        q.add_argument("--ba", default="ray", choices=["ray", "reproj"],
                       help="bundle adjuster: ray (BundleAdjusterRay, the "
                            "reference driver) or reproj "
                            "(BundleAdjusterReproj)")
        q.add_argument("--work_megapix", type=float, default=-1.0,
                       help="registration at this many megapixels "
                            "(<=0: full resolution), compositing at full "
                            "resolution — OpenCV stitching_detailed "
                            "semantics")
        q.add_argument("--full_seam_components", action="store_true",
                       help="full DpSeamFinder component machinery on the "
                            "host (dp_* seam kinds)")
        q.add_argument("--compose_megapix", type=float, default=-1.0,
                       help="composite (warp/seam/blend) at this many "
                            "megapixels in the N-image Stitcher "
                            "(stitching_detailed compose_megapix; <=0: "
                            "full resolution)")
        q.add_argument("--seam_megapix", type=float, default=-1.0,
                       help="resolve host seams (graphcut / full "
                            "components) at this many megapixels and "
                            "upscale the masks (OpenCV stitching_detailed "
                            "seam_megapix; <=0: full resolution)")
        q.add_argument("--crop", default="bbox",
                       choices=["bbox", "interior"],
                       help="final canvas crop: tight bounding box of "
                            "valid pixels, or the largest all-valid "
                            "interior rectangle (removes warped borders)")
        q.add_argument("--seed", type=int, default=0)
        q.add_argument("--metrics", action="store_true",
                       help="print the metrics dict as JSON")

    args = p.parse_args(argv)

    from imagestitch_tpu.utils.io import imread, imwrite, synthetic_pair
    from imagestitch_tpu.pipeline import stitch, stitch_pair

    cfg = _build_config(args)
    if args.cmd == "demo":
        h, w = (int(x) for x in args.size.split("x"))
        img1, img2, _ = synthetic_pair(h, w)
        pano, metrics = stitch_pair(img1, img2, cfg, args.seed)
    else:
        imgs = [imread(f) for f in args.images]
        if len(imgs) == 2:
            pano, metrics = stitch_pair(imgs[0], imgs[1], cfg, args.seed)
        else:
            pano, metrics = stitch(imgs, cfg, args.seed)

    imwrite(args.output, pano)
    print(f"wrote {args.output} ({pano.shape[1]}x{pano.shape[0]})")
    if args.metrics:
        print(json.dumps(metrics, default=float, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
