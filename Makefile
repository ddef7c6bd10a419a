# Developer entry points

.PHONY: test test-units test-e2e bench media clean

# full suite exceeds a 10-min single run on the 1-core sandbox host; the two
# halves match tests' natural split (units/parity vs end-to-end CLI)
test: test-units test-e2e

test-units:
	python -m pytest tests/ -q \
	  --ignore=tests/test_cli_e2e.py --ignore=tests/test_pretrain_mixed.py \
	  --ignore=tests/test_inference_ckpt.py --ignore=tests/test_teacher_workflow.py \
	  --ignore=tests/test_retrieval_inference.py --ignore=tests/test_parallel.py \
	  --ignore=tests/test_patchified_pipeline.py

test-e2e:
	python -m pytest -q tests/test_cli_e2e.py tests/test_pretrain_mixed.py \
	  tests/test_inference_ckpt.py tests/test_teacher_workflow.py \
	  tests/test_retrieval_inference.py tests/test_parallel.py \
	  tests/test_patchified_pipeline.py

bench:
	python bench.py

media:
	$(MAKE) -C alpro_tpu/media libalpro_media.so

clean:
	$(MAKE) -C alpro_tpu/media clean
	find . -name __pycache__ -type d -exec rm -rf {} +
