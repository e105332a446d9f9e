"""Worker process for the 2-host distributed integration test.

Not a pytest module — launched as a subprocess by
``tests/test_distributed.py``. Each worker joins a 2-process CPU
"cluster" (2 virtual devices per process = a 4-device global mesh),
trains one epoch on a shared synthetic dataset, and prints a JSON line
with its view of the run for the parent to cross-check.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    data_dir = sys.argv[3]
    out_dir = sys.argv[4]

    from snn_for_object_detection_tpu.parallel import distributed

    distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    from snn_for_object_detection_tpu.data import PropheseeDataModule
    from snn_for_object_detection_tpu.models.detector import SODa
    from snn_for_object_detection_tpu.models.spec import (
        LI, LIF, Conv, Norm, Return, Tanh,
    )
    from snn_for_object_detection_tpu.train import Trainer

    class MicroSODa(SODa):
        """Tiny 2-scale detector: compile-fast on the 2-process CPU
        cluster while exercising the full sharded train/eval path."""

        def backbone_cfgs(self):
            return [Conv(8, 3, 2), Norm(), LIF()]

        def neck_cfgs(self):
            return [
                Conv(8, 3, 2), Norm(), LIF(), Return(),
                Conv(8, 3, 2), Norm(), LIF(), Return(),
            ]

        def head_cfgs(self, box_out, cls_out):
            return [
                [Conv(kernel_size=1), Norm(), LI(), Tanh()],
                [Conv(box_out, 1)],
                [Conv(cls_out, 1)],
            ]

    data = PropheseeDataModule(
        dataset="gen1",
        data_dir=data_dir,
        batch_size=2,  # per-host; global batch = 4 over 4 devices
        num_steps=4,
        time_shift=2,
        num_workers=1,
        num_load_file=1,
    )
    model = MicroSODa(num_classes=2, in_hw=(data.height, data.width),
                      time_window=2)
    trainer = Trainer(
        max_epochs=1,
        min_epochs=0,
        limit_train_batches=2,
        limit_val_batches=1,
        check_val_every_n_epoch=1,
        out_dir=out_dir,
        log_every_n_steps=1,
    )
    result = trainer.fit(model, data)

    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "process": process_id,
                "host_id": data.host_id,
                "num_hosts": data.num_hosts,
                "best_metric": float(result["best_metric"]),
                "step": int(result["step"]),
            },
            sort_keys=True,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
