"""CLI entry point: python -m monoloco_tpu.run {predict,prep,train,eval}.

Argparse surface mirrors the reference (/root/reference/monoloco/run.py:8-136)
flag-for-flag so existing invocations port directly; additions:
 - predict --json_dir: directory of precomputed pifpaf JSONs (first-class
   keypoint source in this build; openpifpaf remains optional)
 - train --dp_devices: shard the training batch over N chips ('data' mesh)
 - train --tp_devices: also shard the hidden dim over N chips ('model' mesh
   axis, Megatron-style column/row-parallel weights; total = dp*tp)
"""

import argparse


def _camera_source(value):
    """Device index (reference contract: int, run.py:82) or a video file path
    — cv2.VideoCapture accepts both, so `--camera clip.mp4` replays a file."""
    return int(value) if value.lstrip('-').isdigit() else value


def cli():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    subparsers = parser.add_subparsers(help='Different parsers for main actions',
                                      dest='command')
    predict_parser = subparsers.add_parser("predict")
    prep_parser = subparsers.add_parser("prep")
    training_parser = subparsers.add_parser("train")
    eval_parser = subparsers.add_parser("eval")

    # Predict
    predict_parser.add_argument('images', nargs='*', help='input images')
    predict_parser.add_argument('--glob', help='glob expression for input images')
    predict_parser.add_argument('--checkpoint', help='pifpaf model (if openpifpaf installed)')
    predict_parser.add_argument('--json_dir', help='directory of precomputed pifpaf json files')
    predict_parser.add_argument('-o', '--output-directory', dest='output_directory',
                                help='Output directory')
    predict_parser.add_argument('--output_types', nargs='+', default=[],
                                help='what to output: json bird front or multi')
    predict_parser.add_argument('--json-output', default=None, nargs='?', const=True,
                                help='whether to output a pifpaf json file')
    predict_parser.add_argument('--no_save', help='to show images', action='store_true')
    predict_parser.add_argument('--hide_distance', help='hide absolute distances',
                                default=False, action='store_true')
    predict_parser.add_argument('--dpi', help='image resolution', type=int, default=100)
    predict_parser.add_argument('--long-edge', dest='long_edge', default=None, type=int,
                                help='rescale the long side of the image')
    # pifpaf/visual passthroughs (reference run.py:34-44) — accepted for
    # script compatibility; forwarded to openpifpaf when it is installed,
    # otherwise inert (precomputed-json mode needs no decoder settings).
    predict_parser.add_argument('--white-overlay', nargs='?', default=False,
                                const=0.8, type=float,
                                help='increase contrast to annotations by making image whiter')
    predict_parser.add_argument('--font-size', dest='font_size', default=0, type=int,
                                help='annotation font size')
    predict_parser.add_argument('--monocolor-connections', dest='monocolor_connections',
                                default=False, action='store_true',
                                help='use a single color per instance')
    predict_parser.add_argument('--instance-threshold', dest='instance_threshold',
                                type=float, default=None,
                                help='threshold for entire instance')
    predict_parser.add_argument('--seed-threshold', dest='seed_threshold',
                                type=float, default=0.5,
                                help='threshold for single seed')
    predict_parser.add_argument('--disable-cuda', dest='disable_cuda',
                                action='store_true',
                                help='disable CUDA (no-op on the TPU/CPU backends)')
    predict_parser.add_argument('--precise-rescaling', dest='fast_rescaling',
                                default=True, action='store_false',
                                help='use more exact image rescaling (requires scipy)')
    predict_parser.add_argument('--decoder-workers', default=None, type=int,
                                help='number of workers for pose decoding')
    predict_parser.add_argument('--activities', nargs='+',
                                choices=['raise_hand', 'social_distance'], default=[],
                                help='activities to show')
    predict_parser.add_argument('--mode', help='keypoints, mono, stereo', default='mono')
    predict_parser.add_argument('--model', help='path of MonoLoco/MonStereo model to load')
    predict_parser.add_argument('--net', help='only to select older MonoLoco model')
    predict_parser.add_argument('--path_gt', help='path of json file with gt 3d localization')
    predict_parser.add_argument('--z_max', type=int, default=100,
                                help='maximum meters distance for predictions')
    predict_parser.add_argument('--n_dropout', type=int, default=0,
                                help='Epistemic uncertainty evaluation')
    predict_parser.add_argument('--dropout', type=float, default=0.2, help='dropout parameter')
    predict_parser.add_argument('--show_all', action='store_true',
                                help='only predict ground-truth matches or all')
    predict_parser.add_argument('--webcam', help='monstereo streaming', action='store_true')
    predict_parser.add_argument('--camera', help='webcam device index, or a video file path',
                                type=_camera_source, default=0)
    predict_parser.add_argument('--profile', help='directory for jax profiler traces')
    predict_parser.add_argument('--calibration', type=str, default='custom',
                                help='camera calibration: custom, nuscenes, or kitti')
    predict_parser.add_argument('--focal_length', type=float, default=5.7,
                                help='focal length in mm for a sensor of 7.2x5.4 mm')
    predict_parser.add_argument('--threshold_prob', type=float, default=0.25,
                                help='concordance for samples')
    predict_parser.add_argument('--threshold_dist', type=float, default=2.5,
                                help='min distance of people')
    predict_parser.add_argument('--radii', nargs='+', type=float,
                                default=(0.3, 0.5, 1), help='o-space radii')

    # Preprocess
    prep_parser.add_argument('--dir_ann', required=True,
                             help='directory of annotations of 2d joints')
    prep_parser.add_argument('--mode', help='mono, stereo', default='mono')
    prep_parser.add_argument('--dataset', default='kitti',
                             help='datasets to preprocess: nuscenes, nuscenes_teaser, '
                                  'nuscenes_mini, kitti')
    prep_parser.add_argument('--dir_nuscenes', default='data/nuscenes/',
                             help='directory of nuscenes devkit')
    prep_parser.add_argument('--iou_min', type=float, default=0.3,
                             help='minimum iou to match ground truth')
    prep_parser.add_argument('--variance', help='new', action='store_true')
    prep_parser.add_argument('--activity', help='new', action='store_true')

    # Training
    training_parser.add_argument('--joints', required=True, help='Json file with input joints')
    training_parser.add_argument('--mode', help='mono, stereo', default='mono')
    training_parser.add_argument('--out', help='output_path, e.g., data/outputs/test.pkl')
    training_parser.add_argument('-e', '--epochs', type=int, default=500,
                                 help='number of epochs to train for')
    training_parser.add_argument('--bs', type=int, default=512, help='input batch size')
    training_parser.add_argument('--monocular', help='whether to train monoloco',
                                 action='store_true')
    training_parser.add_argument('--dropout', type=float, default=0.2, help='dropout')
    training_parser.add_argument('--lr', type=float, default=0.002, help='learning rate')
    training_parser.add_argument('--sched_step', type=float, default=30,
                                 help='scheduler step time (epochs)')
    training_parser.add_argument('--sched_gamma', type=float, default=0.98,
                                 help='Scheduler multiplication every step')
    training_parser.add_argument('--hidden_size', type=int, default=1024,
                                 help='Number of hidden units in the model')
    training_parser.add_argument('--n_stage', type=int, default=3,
                                 help='Number of stages in the model')
    training_parser.add_argument('--hyp', help='run hyperparameters tuning',
                                 action='store_true')
    training_parser.add_argument('--multiplier', type=int, default=1,
                                 help='Size of the grid of hyp search')
    training_parser.add_argument('--r_seed', type=int, default=1,
                                 help='specify the seed for training and hyp tuning')
    training_parser.add_argument('--print_loss', help='print training and validation losses',
                                 action='store_true')
    training_parser.add_argument('--auto_tune_mtl', action='store_true',
                                 help='whether to use uncertainty to autotune losses')
    training_parser.add_argument('--no_save', help='to not save model and log file',
                                 action='store_true')
    training_parser.add_argument('--dp_devices', type=int, default=1,
                                 help='shard the batch over N devices (data parallelism)')
    training_parser.add_argument('--tp_devices', type=int, default=1,
                                 help='shard the hidden dim over N devices (tensor '
                                      'parallelism; total devices = dp*tp)')
    training_parser.add_argument('--resume', help='checkpoint to resume training from')
    training_parser.add_argument('--profile', help='directory for jax profiler traces')

    # Evaluation
    eval_parser.add_argument('--mode', help='mono, stereo', default='mono')
    eval_parser.add_argument('--dataset', default='kitti',
                             help='datasets to evaluate, kitti or nuscenes')
    eval_parser.add_argument('--activity', help='evaluate activities', action='store_true')
    eval_parser.add_argument('--geometric', help='to evaluate geometric distance',
                             action='store_true')
    eval_parser.add_argument('--generate', help='create txt files for KITTI evaluation',
                             action='store_true')
    eval_parser.add_argument('--dir_ann', help='directory of annotations of 2d joints')
    eval_parser.add_argument('--model', help='path of MonoLoco model to load')
    eval_parser.add_argument('--joints', help='Json file with input joints to evaluate')
    eval_parser.add_argument('--n_dropout', type=int, default=0,
                             help='Epistemic uncertainty evaluation')
    eval_parser.add_argument('--dropout', type=float, default=0.2, help='dropout')
    eval_parser.add_argument('--hidden_size', type=int, default=1024,
                             help='Number of hidden units in the model')
    eval_parser.add_argument('--n_stage', type=int, default=3,
                             help='Number of stages in the model')
    eval_parser.add_argument('--show', help='whether to show statistic graphs',
                             action='store_true')
    eval_parser.add_argument('--save', help='whether to save statistic graphs',
                             action='store_true')
    eval_parser.add_argument('--verbose', help='verbosity of statistics', action='store_true')
    eval_parser.add_argument('--new', help='new', action='store_true')
    eval_parser.add_argument('--variance', help='evaluate keypoints variance',
                             action='store_true')
    eval_parser.add_argument('--net',
                             help='Choose network: monoloco, monoloco_p, monoloco_pp, monstereo')
    eval_parser.add_argument('--baselines', help='whether to evaluate stereo baselines',
                             action='store_true')
    eval_parser.add_argument('--reid_weights', default=None,
                             help='path to a Market-1501 ReID checkpoint (torch .pkl/.pth) '
                                  'for the stereo reid baseline; defaults to '
                                  'data/models/reid_model_market.pkl if present')
    eval_parser.add_argument('--generate_official', action='store_true',
                             help='whether to add empty txt files for official evaluation')
    eval_parser.add_argument('--dp_devices', type=int, default=1,
                             help='shard txt generation over N devices (data parallelism)')

    return parser.parse_args()


def _build_mesh(args):
    """Build args.mesh from --dp_devices/--tp_devices (1-D data mesh or 2-D
    data x model mesh), validating device availability."""
    dp = getattr(args, 'dp_devices', 1)
    tp = getattr(args, 'tp_devices', 1)
    if dp <= 1 and tp <= 1:
        args.mesh = None
        return
    import jax
    from .parallel import make_mesh, make_mesh_2d
    devices = jax.devices()
    needed = dp * tp
    if len(devices) < needed:
        raise SystemExit(
            f"--dp_devices {dp} x --tp_devices {tp} requested but only "
            f"{len(devices)} devices are available")
    args.mesh = (make_mesh_2d(dp, tp, devices) if tp > 1
                 else make_mesh(devices[:dp]))


def _needs_device(args):
    """Whether this invocation will create device arrays — the paths that do
    get a time-boxed backend-liveness probe so a dead remote-TPU tunnel is a
    prompt error, not an indefinite hang. prep, the geometric/variance
    baselines, `predict --mode keypoints` (pifpaf-only, no Loco), and plain
    EvalKitti txt scoring are pure host numpy and must keep working without a
    backend. Mirrors main()'s dispatch order exactly: eval checks --activity
    FIRST (ActivityEvaluator always builds a Loco), before the
    geometric/variance host-only short-circuits."""
    if args.command == 'train':
        return True
    if args.command == 'predict':
        return bool(args.webcam) or args.mode != 'keypoints'
    if args.command == 'eval':
        if args.activity:
            return True
        if args.geometric or args.variance:
            return False
        return bool(args.generate or 'nuscenes' in args.dataset)
    return False


def main():
    args = cli()
    from .utils import enable_compilation_cache
    enable_compilation_cache()
    if _needs_device(args):
        from .utils.backend import require_live_backend
        require_live_backend(context=f'{args.command} command')
    if args.command == 'predict':
        if args.webcam:
            from .visuals.webcam import webcam
            webcam(args)
        else:
            from .predict import predict
            predict(args)

    elif args.command == 'prep':
        if 'nuscenes' in args.dataset:
            from .prep.preprocess_nu import PreprocessNuscenes
            prep = PreprocessNuscenes(args.dir_ann, args.dir_nuscenes, args.dataset,
                                      args.iou_min)
            prep.run()
        else:
            from .prep.preprocess_kitti import PreprocessKitti
            prep = PreprocessKitti(args.dir_ann, mode=args.mode, iou_min=args.iou_min)
            if args.activity:
                prep.process_activity()
            else:
                prep.run()

    elif args.command == 'train':
        if args.hyp:
            from .train import HypTuning
            hyp_tuning = HypTuning(joints=args.joints, epochs=args.epochs,
                                   monocular=args.monocular, dropout=args.dropout,
                                   multiplier=args.multiplier, r_seed=args.r_seed)
            hyp_tuning.train(args)
        else:
            from .train import Trainer
            _build_mesh(args)
            training = Trainer(args)
            _ = training.train()
            _ = training.evaluate()

    elif args.command == 'eval':
        if args.activity:
            from .eval.eval_activity import ActivityEvaluator
            evaluator = ActivityEvaluator(args)
            if 'collective' in args.dataset:
                evaluator.eval_collective()
            else:
                evaluator.eval_kitti()
        elif args.geometric:
            assert args.joints, "joints argument not provided"
            from .eval.geom_baseline import geometric_baseline
            geometric_baseline(args.joints)
        elif args.variance:
            assert args.joints, "joints argument not provided"
            from .eval.eval_variance import joints_variance
            joints_variance(args.joints, clusters=None, dic_ms=None)
        else:
            if args.generate:
                from .eval.generate_kitti import GenerateKitti
                _build_mesh(args)
                kitti_txt = GenerateKitti(args)
                kitti_txt.run()
            if args.dataset == 'kitti':
                from .eval import EvalKitti
                kitti_eval = EvalKitti(args)
                kitti_eval.run()
                kitti_eval.printer()
            elif 'nuscenes' in args.dataset:
                from .train import Trainer
                # The eval namespace lacks the training-only flags Trainer
                # reads; fill them with the training defaults.
                for attr, default in (('out', None), ('epochs', 0), ('bs', 512),
                                      ('lr', 0.002), ('sched_step', 30),
                                      ('sched_gamma', 0.98), ('r_seed', 1),
                                      ('auto_tune_mtl', False), ('no_save', True),
                                      ('print_loss', False)):
                    if not hasattr(args, attr):
                        setattr(args, attr, default)
                training = Trainer(args)
                _ = training.evaluate(load=True, model=args.model, debug=False)
            else:
                raise ValueError("Option not recognized")
    else:
        raise ValueError("Main subparser not recognized or not provided")


if __name__ == '__main__':
    main()
