echo windows startup of videovanish-tpu
REM Reference counterpart: start_videovanish.bat.

set "CONDA=%UserProfile%\miniconda3\condabin\conda.bat"
CALL "%UserProfile%\miniconda3\Scripts\activate.bat" videovanish

echo Starting videovanish... Please wait.. The first run compiles the
echo model programs and may take a few minutes before the GUI is ready.
python videovanish.py
pause
