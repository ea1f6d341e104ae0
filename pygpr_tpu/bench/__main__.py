from pygpr_tpu.bench import main

main()
