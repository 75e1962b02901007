#!/usr/bin/env bash
# Reference i2vgen-xl/scripts/run_group_pnp_edit.sh equivalent.
set -e
cd "$(dirname "$0")/.."
python -m anyv2v_tpu.cli.run_group_pnp_edit \
    --template_config configs/group_pnp_edit/template.yaml \
    --configs_json configs/group_pnp_edit/group_config.json "$@"
