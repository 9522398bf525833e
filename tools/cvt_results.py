"""Challenge submission packaging: per-video JSONs -> xz-compressed zip
(capability-parity with reference utils/cvt_result.py, without os.system)."""
import argparse
import json
import lzma
import os
import zipfile


def main(args):
    with open(args.results_json) as f:
        results = json.load(f)
    os.makedirs(args.output_dir, exist_ok=True)
    xz_paths = []
    for video_name, rels in results.items():
        p = os.path.join(args.output_dir, f"{video_name}.json.xz")
        with lzma.open(p, "wt") as f:
            json.dump({"results": {video_name: rels}}, f)
        xz_paths.append(p)
    zip_path = os.path.join(args.output_dir, "submission.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in xz_paths:
            z.write(p, arcname=os.path.basename(p))
    print(f"packaged {len(xz_paths)} videos into {zip_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_json", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="submission")
    main(parser.parse_args())
