from fusion3dseg_tpu.cli import main

main()
