"""Full-KITTI-scale txt generation stress bench.

The real KITTI val split has 3,769 images (reference splits/kitti_val.txt);
this drives GenerateKitti (the offline serving path: annotations -> batched
whole-image device programs -> KITTI txts, eval/generate_kitti.py) over a
synthetic dataset of that exact scale and reports wall-clock + images/sec.
Mesh-sharded variant: pass --dp_devices N (adds the 'data' mesh axis used by
tests/test_parallel.py::TestMeshShardedGeneration).

Usage:
    python tools/bench_generate_full_scale.py [root] [--mode mono|stereo]
        [--dp_devices N] [--n_val 3769] [--model ckpt]

Without --model, a random-init checkpoint at the production size (hidden 1024,
3 stages) is written first — generation throughput is weight-independent.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('root', nargs='?', default='/tmp/fullscale_kitti')
    ap.add_argument('--mode', default='mono', choices=('mono', 'stereo'))
    ap.add_argument('--dp_devices', type=int, default=1)
    ap.add_argument('--n_val', type=int, default=3769)
    ap.add_argument('--model', default=None)
    args = ap.parse_args()
    args.root = os.path.abspath(args.root)
    if args.model:
        args.model = os.path.abspath(args.model)

    from make_synthetic_kitti import make_dataset
    t0 = time.time()
    val_split = os.path.join(args.root, 'splits', 'kitti_val.txt')
    if not os.path.exists(val_split):
        make_dataset(args.root, n_train=8, n_val=args.n_val, seed=13)
    # Reused roots keep their existing dataset; report its REAL size, not the
    # requested one, so images/sec can't drift on rerun.
    with open(val_split) as f:
        args.n_val = len([l for l in f if l.strip()])
    print(f'dataset ({args.n_val} val scenes): {time.time() - t0:.1f}s',
          flush=True)

    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    os.chdir(args.root)
    model = args.model
    if model is None:
        import jax
        from monoloco_tpu.models import init_loco_params
        from monoloco_tpu.models.checkpoint import save_checkpoint
        in_dim, out_dim = (68, 10) if args.mode == 'stereo' else (34, 9)
        params, bn = init_loco_params(jax.random.PRNGKey(0), in_dim, out_dim,
                                      1024, 3)
        model = os.path.join(args.root, 'data', 'outputs', 'fullscale.pkl')
        net = 'monstereo' if args.mode == 'stereo' else 'monoloco_pp'
        save_checkpoint(model, params, bn, meta={'net': net})

    from monoloco_tpu.eval import GenerateKitti
    mesh = None
    if args.dp_devices > 1:
        import jax
        from monoloco_tpu.parallel import make_mesh
        mesh = make_mesh(jax.devices()[:args.dp_devices])
    gen_args = argparse.Namespace(
        mode=args.mode, model=model, dir_ann='annotations', n_dropout=0,
        dropout=0.2, hidden_size=1024, n_stage=3, baselines=False,
        generate_official=False, verbose=False, save=False, show=False,
        mesh=mesh)
    gen = GenerateKitti(gen_args)

    out_dir = os.path.join('data', 'kitti', 'monoloco_pp'
                           if args.mode == 'mono' else 'monstereo')
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):     # stale txts would fake txt_written
            if f.endswith('.txt'):
                os.remove(os.path.join(out_dir, f))

    t1 = time.time()
    gen.run()
    wall = time.time() - t1
    n_txt = len([f for f in os.listdir(out_dir) if f.endswith('.txt')]) \
        if os.path.isdir(out_dir) else -1
    print(json.dumps({
        'metric': f'generate_kitti_{args.mode}_full_scale',
        'n_images': args.n_val, 'txt_written': n_txt,
        'dp_devices': args.dp_devices,
        'wall_s': round(wall, 2),
        'images_per_sec': round(args.n_val / wall, 1),
    }))


if __name__ == '__main__':
    main()
