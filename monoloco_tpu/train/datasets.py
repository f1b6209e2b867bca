"""Dataset loading: joints JSON -> HBM-resident arrays.

The joints file schema matches the reference prep output
(/root/reference/monoloco/train/datasets.py:44-96):
{train|val|test: {X, Y, names, kps, K, clst: {bin: {X, Y, kps}}}, version}.

The whole dataset is a few MB of float32, so it is loaded eagerly into device
memory once; the training loop then runs entirely on-device with no host
transfers per batch (the reference pays a CPU->GPU copy every batch,
trainer.py:151-152).
"""

import json

import numpy as np


class KeypointsDataset:
    """Eager array-backed dataset for the KITTI/nuScenes joints JSONs."""

    def __init__(self, joints, phase):
        assert phase in ('train', 'val', 'test')
        with open(joints, 'r') as f:
            dic_jo = json.load(f)
        self.inputs_all = np.asarray(dic_jo[phase]['X'], dtype=np.float32)
        self.outputs_all = np.asarray(dic_jo[phase]['Y'], dtype=np.float32)
        self.names_all = dic_jo[phase]['names']
        self.kps_all = np.asarray(dic_jo[phase]['kps'], dtype=np.float32)
        self.version = dic_jo.get('version', 'unknown')
        self.dic_clst = dic_jo[phase]['clst']

    def __len__(self):
        return self.inputs_all.shape[0]

    def __getitem__(self, idx):
        return (self.inputs_all[idx], self.outputs_all[idx],
                self.names_all[idx] if isinstance(idx, int) else [self.names_all[i] for i in np.atleast_1d(np.arange(len(self))[idx])],
                self.kps_all[idx])

    def arrays(self):
        """Full (X, Y) arrays for on-device training."""
        return self.inputs_all, self.outputs_all

    def get_cluster_annotations(self, clst):
        inputs = np.asarray(self.dic_clst[clst]['X'], dtype=np.float32)
        outputs = np.asarray(self.dic_clst[clst]['Y'], dtype=np.float32)
        return inputs, outputs, len(self.dic_clst[clst]['Y'])

    def get_version(self):
        return self.version


class ActivityDataset:
    """X/Y-only variant for the activity (social interaction) head."""

    def __init__(self, joints, phase):
        assert phase in ('train', 'val', 'test')
        with open(joints, 'r') as f:
            dic_jo = json.load(f)
        self.inputs_all = np.asarray(dic_jo[phase]['X'], dtype=np.float32)
        self.outputs_all = np.asarray(dic_jo[phase]['Y'], dtype=np.float32).reshape(-1, 1)

    def __len__(self):
        return self.inputs_all.shape[0]

    def __getitem__(self, idx):
        return self.inputs_all[idx], self.outputs_all[idx]

    def arrays(self):
        return self.inputs_all, self.outputs_all
