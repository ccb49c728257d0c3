"""Tests for the interactive HTML scene viewer (utils/web_vis.py).

No browser/node exists in this image, so the JS cannot be executed here;
these tests pin everything verifiable outside one: the embedded data
roundtrips bitwise, the box/caption JSON is valid and ordered, the
document is structurally sound, and subsampling keeps the file bounded.
"""
import base64
import json
import re

import numpy as np

from spsnet_tpu.utils.web_vis import draw_scenes


def _gen(tmp_path, n=500, **kw):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, size=(n, 4)).astype(np.float32)
    out = draw_scenes(tmp_path / 'scene.html', pts, **kw)
    return pts, out.read_text()


def test_points_embed_roundtrip(tmp_path):
    pts, html = _gen(tmp_path)
    m = re.search(r'new Float32Array\(b64\("([^"]+)"\)\)', html)
    assert m, 'embedded point payload not found'
    got = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    got = got.reshape(-1, 4)
    np.testing.assert_array_equal(got, pts)


def test_boxes_scores_labels_embed(tmp_path):
    gt = np.array([[1, 2, 3, 4, 5, 6, 0.5]], np.float32)
    pred = np.array([[7, 8, 9, 1, 1, 1, -0.25], [0, 0, 0, 2, 2, 2, 0]],
                    np.float32)
    _, html = _gen(tmp_path, gt_boxes=gt, ref_boxes=pred,
                   ref_scores=[0.9, 0.4], ref_labels=[1, 3],
                   class_names=['Car', 'Ped', 'Cyc'])
    gt_js = json.loads(re.search(r'const GT = (\[.*?\]);', html).group(1))
    pred_js = json.loads(re.search(r'const PRED = (\[.*?\]);', html).group(1))
    txt = json.loads(re.search(r'const PRED_TXT = (\[.*?\]);', html).group(1))
    assert gt_js == [[1, 2, 3, 4, 5, 6, 0.5]]
    assert len(pred_js) == 2 and pred_js[0][6] == -0.25
    assert txt == ['Car 0.90', 'Cyc 0.40']


def test_structurally_sound_and_no_leftover_tokens(tmp_path):
    _, html = _gen(tmp_path)
    assert html.count('<script>') == html.count('</script>') == 1
    assert html.lstrip().startswith('<!DOCTYPE html>')
    assert html.rstrip().endswith('</html>')
    # every template placeholder must have been substituted
    assert 'PTS_B64' not in html
    assert '__GT__' not in html and '__PRED__' not in html
    # braces balance inside the script (cheap JS syntax smoke)
    script = html.split('<script>')[1].split('</script>')[0]
    for o, c in ('{}', '()', '[]'):
        assert script.count(o) == script.count(c), f'unbalanced {o}{c}'


def test_subsampling_caps_file_size(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, size=(5000, 3)).astype(np.float32)
    out = draw_scenes(tmp_path / 's.html', pts, max_points=1000)
    m = re.search(r'new Float32Array\(b64\("([^"]+)"\)\)', out.read_text())
    got = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    assert got.size == 1000 * 4
    # intensity column defaults to zero when points are (N, 3)
    assert np.all(got.reshape(-1, 4)[:, 3] == 0)
