package logisticsfs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;

/**
 * AbstractFileSystem twin of {@link S3AStubFileSystem}: Structured
 * Streaming's checkpoint file manager resolves paths through
 * FileContext, which looks up fs.AbstractFileSystem.&lt;scheme&gt;.impl
 * instead of fs.&lt;scheme&gt;.impl — without this delegate the
 * streaming metadata log cannot open s3a:// sink/checkpoint URIs even
 * though the plain FileSystem stub is bound. Wire up with:
 *   spark.hadoop.fs.AbstractFileSystem.s3a.impl=logisticsfs.S3AStubAbstractFs
 * NEVER use outside tests.
 */
public class S3AStubAbstractFs extends DelegateToFileSystem {
    public S3AStubAbstractFs(URI uri, Configuration conf)
            throws IOException, URISyntaxException {
        super(uri, new S3AStubFileSystem(), conf, "s3a", false);
    }

    @Override
    public int getUriDefaultPort() {
        return -1;
    }
}
