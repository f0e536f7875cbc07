"""Dataloader factory (reference ``REC/data/utils.py:13-77``): model name →
batcher classes, returning (train, valid, test) batchers."""

from __future__ import annotations

from mhrec_tpu.data.evalset import SeqEvalBatcher
from mhrec_tpu.data.trainset import SEQTrainBatcher
from mhrec_tpu.data.textset import TextSEQTrainBatcher

# model name → train batcher class (reference data/utils.py:18-26 registry)
_TRAIN_BATCHERS = {
    "default": SEQTrainBatcher,
    "HLLM": TextSEQTrainBatcher,
}


def build_dataloader(config, dataload, world_size: int = 1, host_id: int = 0, num_hosts: int = 1):
    model = str(config["model"] or "HSTU")
    cls = _TRAIN_BATCHERS.get(model, _TRAIN_BATCHERS["default"])
    train = cls(config, dataload, world_size=world_size, host_id=host_id, num_hosts=num_hosts)
    valid = SeqEvalBatcher(config, dataload, phase="valid", host_id=host_id, num_hosts=num_hosts)
    test = SeqEvalBatcher(config, dataload, phase="test", host_id=host_id, num_hosts=num_hosts)
    return train, valid, test
