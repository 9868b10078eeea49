module github.com/helix-tpu/helix-tpu-go

go 1.21
