from fastspeech2_tpu.cli import main

main()
