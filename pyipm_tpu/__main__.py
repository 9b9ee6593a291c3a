from pyipm_tpu.cli import main

main()
