# vcr_tpu developer targets
.PHONY: test test-fast smoke bench bench-train bench-all native equivalence capture entry dryrun checks-cpu demo-occupancy clean

test:            ## full suite on the 8-virtual-device CPU mesh
	python -m pytest tests/ -q

test-fast:       ## unit tests only (skip the slow end-to-end loops)
	python -m pytest tests/ -q --ignore=tests/test_train_loop.py \
	    --ignore=tests/test_mesh_training.py --ignore=tests/test_cli_prep.py

smoke:           ## end-to-end CLI smoke over every mode (CPU, ~2 min)
	python scripts/smoke.py

bench:           ## headline benchmark (one JSON line, real TPU)
	python bench.py

bench-train:     ## training-step throughput
	python bench_train.py

bench-all:       ## all five model-family configs
	python bench_all.py

native:          ## build the C++ batch loader explicitly
	g++ -O3 -shared -fPIC -pthread -std=c++17 native/npy_loader.cpp \
	    -o vcr_tpu/data/_libnpy.so

equivalence:     ## whole-run equivalence vs the reference, all five families
	for a in s2vt s2vt-att transformer spatial rationale; do \
	    python scripts/run_equivalence.py --arch $$a --epochs 10 || exit 1; done

capture:         ## one-shot on-chip evidence capture (real TPU)
	bash scripts/capture_onchip.sh

entry:           ## driver compile-check
	python __graft_entry__.py

dryrun:          ## 8-virtual-device multichip dry run
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

checks-cpu:      ## full tpu_checks pass dry-run on CPU (interpret kernels)
	JAX_PLATFORMS=cpu VCR_SKIP_PROBE=1 VCR_CHECKS_FORCE=1 python -c \
	    "import jax; jax.config.update('jax_platforms','cpu'); \
	     import runpy, sys; sys.argv=['tpu_checks.py']; \
	     runpy.run_path('tpu_checks.py', run_name='__main__')"

demo-occupancy:  ## continuous-vs-batch scheduling win on a skewed workload
	python scripts/demo_continuous_occupancy.py

clean:
	rm -rf vcr_tpu/data/_libnpy.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
