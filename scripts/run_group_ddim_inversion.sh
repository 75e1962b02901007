#!/usr/bin/env bash
# Reference i2vgen-xl/scripts/run_group_ddim_inversion.sh equivalent.
set -e
cd "$(dirname "$0")/.."
python -m anyv2v_tpu.cli.run_group_ddim_inversion \
    --template_config configs/group_ddim_inversion/template.yaml \
    --configs_json configs/group_ddim_inversion/group_config.json "$@"
