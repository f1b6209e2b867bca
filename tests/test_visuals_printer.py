"""Printer figure-content checks (beyond the CLI tests' file-existence
assertions): box/marker counts, mono/stereo color coding, social-distance
coloring, adaptive z_max, and the uncertainty/orientation overlays."""

import argparse
import os

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
from matplotlib.patches import FancyArrow, Rectangle
import numpy as np
import pytest
from PIL import Image


def _args(output_types, **kw):
    base = dict(output_types=output_types, z_max=100, show_all=False,
                no_save=True, hide_distance=False, activities=[])
    base.update(kw)
    return argparse.Namespace(**base)


def _dic_out():
    return {
        'dds_pred': [10.0, 20.0, 45.0],
        'stds_ale': [0.5, 1.0, 2.0],
        'angles': [0.3, -0.5, 0.0],
        'xyz_pred': [[1.0, 0.5, 10.0], [-2.0, 0.5, 20.0], [3.0, 0.5, 45.0]],
        'boxes': [[10, 50, 60, 200, 0.9], [300, 40, 360, 210, 0.8],
                  [500, 60, 540, 180, 0.7]],
        'aux': [0.9, 0.1, 0.1],           # detection 0 is a stereo match
        'xyz_real': [[1.1, 0.5, 10.5]],
        'dds_real': [10.5],
    }


def _printer(output_types, dic_out, **kw):
    from monoloco_tpu.visuals.printer import Printer
    image = Image.new('RGB', (640, 480))
    p = Printer(image, '/tmp/unused', kk=np.eye(3).tolist(),
                args=_args(output_types, **kw))
    figures, axes = p.factory_axes(dic_out)
    return p, figures, axes, image


class TestPrinterContent:

    def test_multi_figure_boxes_texts_and_markers(self):
        dic_out = _dic_out()
        p, figures, axes, image = _printer(['multi'], dic_out)
        assert len(figures) == 1 and len(axes) == 2
        assert axes[0].front and not axes[1].front
        p.close_on_draw = False
        p.save = False
        p.draw(figures, axes, image, dic_out)
        front, bird = axes
        rects = [pa for pa in front.patches if isinstance(pa, Rectangle)]
        assert len(rects) == 3
        # stereo detection drawn deepskyblue, mono ones red
        assert rects[0].get_edgecolor() == matplotlib.colors.to_rgba('deepskyblue')
        assert rects[1].get_edgecolor() == matplotlib.colors.to_rgba('red')
        texts = [t.get_text() for t in front.texts]
        assert '10.0 m' in texts and '45.0 m' in texts
        # bird view: 3 detection markers + 1 gt cross + uncertainty bars
        markers = [l for l in bird.lines if l.get_marker() == 'o']
        crosses = [l for l in bird.lines if l.get_marker() == 'x']
        assert len(markers) == 3 and len(crosses) == 1
        arrows = [pa for pa in bird.patches if isinstance(pa, FancyArrow)]
        assert len(arrows) == 3  # orientation arrows for every detection
        for fig in figures:
            plt.close(fig)

    def test_adaptive_z_max_clamps_to_detections(self):
        p, figures, _, _ = _printer(['bird'], _dic_out())
        # z_max 100 shrinks to 4 + max(dds, dds_real) = 49
        assert p.z_max == 49
        for fig in figures:
            plt.close(fig)

    def test_out_of_range_detection_skipped_in_bird(self):
        dic_out = _dic_out()
        p, figures, axes, image = _printer(['bird'], dic_out, z_max=15)
        p.close_on_draw = False
        p.save = False
        p.draw(figures, axes, image, dic_out)
        markers = [l for l in axes[0].lines if l.get_marker() == 'o']
        assert len(markers) == 1  # only the z=10 detection is inside z_max=15
        for fig in figures:
            plt.close(fig)

    def test_social_distance_coloring(self):
        dic_out = _dic_out()
        dic_out['social_distance'] = [True, False, False]
        p, figures, axes, image = _printer(
            ['front'], dic_out, activities=['social_distance'])
        p.close_on_draw = False
        p.save = False
        p.draw(figures, axes, image, dic_out)
        rects = [pa for pa in axes[0].patches if isinstance(pa, Rectangle)]
        assert rects[0].get_edgecolor() == matplotlib.colors.to_rgba('r')
        # non-violators must be visually distinct from the violator red
        assert rects[1].get_edgecolor() == matplotlib.colors.to_rgba('deepskyblue')
        for fig in figures:
            plt.close(fig)

    def test_hide_distance_suppresses_labels(self):
        dic_out = _dic_out()
        p, figures, axes, image = _printer(['front'], dic_out, hide_distance=True)
        p.close_on_draw = False
        p.save = False
        p.draw(figures, axes, image, dic_out)
        assert all('m' not in t.get_text() for t in axes[0].texts)
        for fig in figures:
            plt.close(fig)

    def test_save_writes_expected_suffixes(self, tmp_path):
        from monoloco_tpu.visuals.printer import Printer
        dic_out = _dic_out()
        image = Image.new('RGB', (320, 240))
        out = str(tmp_path / 'out_img.png')
        p = Printer(image, out, kk=np.eye(3).tolist(),
                    args=_args(['front', 'bird'], no_save=False))
        figures, axes = p.factory_axes(dic_out)
        p.draw(figures, axes, image, dic_out)
        assert os.path.exists(out + '.front.png')
        assert os.path.exists(out + '.bird.png')
