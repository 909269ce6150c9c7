"""CLI driver tests (the replacement for the reference's hardcoded-path
main()s, ref 特征点检测.cpp:1027-1029). Run in-process so the forced-CPU
test backend applies; tiny images keep the default-config compile small.
"""

import json
import numpy as np

from imagestitch_tpu.cli import main
from imagestitch_tpu.utils.io import imwrite, synthetic_pair

# every test shares the one default-config executable; 160x224 is the
# smallest size where the default overlap yields a valid homography
SIZE = "160x224"


def test_cli_demo_writes_pano(tmp_path, capsys):
    out = tmp_path / "pano.png"
    rc = main(["demo", "--size", SIZE, "-o", str(out), "--metrics"])
    assert rc == 0
    assert out.exists()
    stdout = capsys.readouterr().out
    assert "wrote" in stdout
    m = json.loads(stdout.split("\n", 1)[1])
    assert m["h_valid"]


def test_cli_stitch_files(tmp_path):
    i1, i2, _ = synthetic_pair(160, 224, overlap=0.6, seed=1)
    f1, f2 = tmp_path / "a.png", tmp_path / "b.png"
    imwrite(str(f1), np.asarray(i1))
    imwrite(str(f2), np.asarray(i2))
    out = tmp_path / "pano.png"
    rc = main(["stitch", str(f1), str(f2), "-o", str(out)])
    assert rc == 0
    from imagestitch_tpu.utils.io import imread
    pano = imread(str(out))
    assert pano.shape[1] > 224  # extends past one input's width
