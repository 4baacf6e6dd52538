#!/bin/bash
# Episode-throughput benchmark on the attached TPU.
set -e
python bench.py
