"""STUB of the openpifpaf surface `monoloco_tpu.predict.run_pifpaf` consumes.

NOT the real library (openpifpaf is uninstallable in the zero-egress test
container — DEVIATIONS.md). This package exposes the exact API shape the
integration branch touches, mirroring the reference's usage
(/root/reference/monoloco/predict.py:150-152,174,184):

  - ``openpifpaf.decoder.configure(args)``             (module hook)
  - ``openpifpaf.Predictor.configure(args)``           (classmethod hook)
  - ``openpifpaf.Predictor(checkpoint=...)``           (CNN load, cached)
  - ``predictor.images(paths, batch_size=1)`` yielding
    ``(predictions, gt_anns, meta)`` with ``meta['file_name']`` and
    each prediction exposing ``.json_data()`` -> pifpaf annotation dict
    (51-float COCO-17 'keypoints', xywh 'bbox', 'score').

tests/test_pifpaf_stub.py puts ``tests/stubs`` on sys.path and drives
predict.py's configure-forwarding and predictor-caching branches through it
in the DEFAULT suite; the real wheel is still exercised by the gated CI job
(tests/test_openpifpaf_integration.py). Call sequences are recorded in
module-level lists so tests can assert the contract.
"""

from . import decoder  # noqa: F401  (submodule must exist as an attribute)

#: every Predictor(...) construction, as the checkpoint value — the cache
#: test asserts one entry across repeated run_pifpaf calls
PREDICTOR_INSTANTIATIONS = []
#: every configure(...) call as (target, args) — the forwarding test asserts
#: both 'decoder' and 'Predictor' receive the namespace
CONFIGURE_CALLS = []

#: what predictor.images yields per image (pifpaf json_data schema);
#: tests override via set_annotations. Default: one synthetic upright person
#: in a KITTI-sized image.
_DEFAULT_PERSON = {
    'keypoints': [
        # COCO-17 order, (u, v, conf) triplets: head at ~(600, 120),
        # feet at ~(600, 300) — a plausible standing pedestrian.
        600., 120., 0.9,   602., 118., 0.8,   598., 118., 0.8,
        606., 120., 0.7,   594., 120., 0.7,   612., 150., 0.9,
        588., 150., 0.9,   616., 180., 0.8,   584., 180., 0.8,
        618., 205., 0.7,   582., 205., 0.7,   608., 215., 0.9,
        592., 215., 0.9,   606., 255., 0.8,   594., 255., 0.8,
        604., 295., 0.8,   596., 295., 0.8,
    ],
    'bbox': [580.0, 110.0, 40.0, 195.0],
    'score': 0.88,
    'category_id': 1,
}
_annotations = [dict(_DEFAULT_PERSON)]


def set_annotations(anns):
    """Test hook: set the annotation dicts .images() yields per image."""
    global _annotations
    _annotations = [dict(a) for a in anns]


def reset():
    """Test hook: clear recorded calls and restore default annotations."""
    global _annotations
    PREDICTOR_INSTANTIATIONS.clear()
    CONFIGURE_CALLS.clear()
    decoder.reset()
    _annotations = [dict(_DEFAULT_PERSON)]


class _Annotation:
    """Mimics openpifpaf.annotation.Annotation just enough: json_data()."""

    def __init__(self, data):
        self._data = data

    def json_data(self):
        return dict(self._data)


class Predictor:
    """Mimics openpifpaf.Predictor: classmethod configure + images()."""

    @classmethod
    def configure(cls, args):
        if getattr(args, 'stub_raise_on_configure', False):
            # Test hook for the partial-namespace warning branch in
            # run_pifpaf (predict.py): real configure hooks can raise on
            # incomplete argparse namespaces.
            raise AttributeError('stub: incomplete args namespace')
        # The localization pipeline requires complete poses; run_pifpaf must
        # have defaulted this before forwarding (reference predict.py:142).
        assert getattr(args, 'force_complete_pose', None) is not None
        CONFIGURE_CALLS.append(('Predictor', args))

    def __init__(self, checkpoint=None):
        PREDICTOR_INSTANTIATIONS.append(checkpoint)
        self.checkpoint = checkpoint

    def images(self, paths, batch_size=1):  # noqa: ARG002 — real signature
        for path in paths:
            preds = [_Annotation(a) for a in _annotations]
            yield preds, None, {'file_name': path}
