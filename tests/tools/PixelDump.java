// Independent pixel oracle for the image-codec differential tests:
// javax.imageio (the JDK's own PNG/BMP/GIF/JPEG decoders — a codebase
// sharing nothing with cc_extract) dumps ARGB rows as hex lines.
// Usage: java PixelDump file1 file2 ...   ->
//   FILE <path> <w> <h>
//   <w hex8 pixels per row line>
// For grayscale images getRGB() would pass samples through an ICC
// gray->sRGB conversion (e.g. 204 -> 231); every plain consumer (and the
// decoders under test) treats gray samples as linear luma, so grayscale
// images are dumped from the raw raster instead (band 0 = gray, band 1 =
// alpha when present), packed as the same ARGB hex.
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.File;
import javax.imageio.ImageIO;

public class PixelDump {
    public static void main(String[] args) throws Exception {
        StringBuilder sb = new StringBuilder();
        for (String f : args) {
            BufferedImage img = ImageIO.read(new File(f));
            if (img == null) {
                sb.append("FILE ").append(f).append(" UNSUPPORTED\n");
                continue;
            }
            int w = img.getWidth(), h = img.getHeight();
            sb.append("FILE ").append(f).append(' ').append(w).append(' ')
              .append(h).append('\n');
            boolean gray = img.getColorModel().getNumColorComponents() == 1;
            Raster ras = img.getRaster();
            boolean hasAlpha = img.getColorModel().hasAlpha();
            int shift = img.getColorModel().getComponentSize(0) > 8 ? 8 : 0;
            for (int y = 0; y < h; y++) {
                for (int x = 0; x < w; x++) {
                    int argb;
                    if (gray) {
                        int g = ras.getSample(x, y, 0) >> shift;
                        int a = hasAlpha ? (ras.getSample(x, y, 1) >> shift)
                                         : 255;
                        argb = (a << 24) | (g << 16) | (g << 8) | g;
                    } else {
                        argb = img.getRGB(x, y);
                    }
                    sb.append(String.format("%08x", argb));
                }
                sb.append('\n');
            }
        }
        System.out.print(sb);
    }
}
